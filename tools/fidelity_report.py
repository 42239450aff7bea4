"""Fidelity report: deltas vs the torch reference across precision modes.

Prints, for every precision operating point, the max logit/probability
delta against the golden torch dump and the argmax agreement over all
shipped trials. With --stages it also bisects the pipeline: filter-stage
deltas vs the committed f64-reference filtered windows, and model-stage
deltas (golden filtered windows -> this backend's decoder) — so an
end-to-end miss can be attributed to the filter or the recurrence.

  python tools/fidelity_report.py [--platform cpu|axon] [--stages]
  python tools/fidelity_report.py --platform cpu --write-filtered
      # regenerate tests/golden/reference_filtered.npz (scipy+numpy f64)
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax

GOLDEN_PROBS = REPO_ROOT / "tests/golden/reference_probs.npz"
GOLDEN_FILTERED = REPO_ROOT / "tests/golden/reference_filtered.npz"
PRODUCTION_LAMBDA = 1.25e-29  # reference: tester.py:84


def write_filtered(ds) -> None:
    """f64 scipy/numpy rendering of the reference filter on every trial,
    independent of the JAX implementation (reference semantics:
    MindsAI/mindsai_filter_python/core.py:14-38)."""
    import numpy as np
    import scipy.signal

    out = np.empty_like(ds.windows, dtype=np.float32)
    for i, w in enumerate(ds.windows):
        y = w.astype(np.float64).T  # [C, T]
        phases = np.angle(scipy.signal.hilbert(y.T, axis=0))  # [T, C]
        diff = phases[:, :, None] - phases[:, None, :]
        p = np.sum(np.sin(diff) ** 2, axis=0)
        np.fill_diagonal(p, 0.0)
        d = np.sqrt(np.clip(np.diag(p), 1e-12, None))
        p = p / np.outer(d, d)
        c = p.shape[0]
        inv = np.linalg.inv(np.eye(c) + PRODUCTION_LAMBDA * (p.T @ p))
        out[i] = (inv @ y).T.astype(np.float32)
    np.savez_compressed(
        GOLDEN_FILTERED, files=np.asarray(ds.files), filtered=out
    )
    print(f"wrote {GOLDEN_FILTERED} ({out.nbytes/1e6:.1f} MB raw)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--stages", action="store_true", help="per-stage bisect")
    ap.add_argument("--write-filtered", action="store_true")
    ap.add_argument("--json", default=None,
                    help="also write the report as a JSON artifact (e.g. "
                         "checkpoints/fidelity_r3.json) so on-chip claims "
                         "are auditable, not just doc prose")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if jax.devices()[0].platform == "cpu":
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from neural_speech_decoding_tpu.config import (
        FIVE_CLASS_PREFIXES,
        DecoderConfig,
        FilterConfig,
    )
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
    from neural_speech_decoding_tpu.io.dataset import load_trials
    from neural_speech_decoding_tpu.models.lstm import decoder_apply
    from neural_speech_decoding_tpu.ops.kuramoto import (
        mai_filter,
        mai_filter_batch,
    )

    # all 324 shipped trials (BASELINE.md fidelity universe) — fidelity is
    # label-free, so the yes/no trials are real-signal vectors too
    ds = load_trials(class_prefixes=FIVE_CLASS_PREFIXES)
    if args.write_filtered:
        write_filtered(ds)
        return

    with np.load(GOLDEN_PROBS, allow_pickle=False) as z:
        golden = {k: z[k] for k in z.files}
    assert list(golden["files"]) == list(ds.files)
    params = jax.device_put(
        load_decoder_params(
            "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
            "lstm_classifier_Water_Food_Bg_Noise.pth"
        )
    )
    ref_logits = golden["logits"]
    ref_argmax = ref_logits.argmax(1)

    x64 = jax.config.read("jax_enable_x64")
    modes = []
    if x64:
        modes.append(("fidelity f64", FilterConfig(precision="highest"), DecoderConfig()))
    else:
        # On TPU "highest" is the f32 fidelity path: HIGHEST-precision
        # matmul Hilbert + folded-lambda operator (no 1e24-scale P^T P).
        modes.append(("fidelity f32", FilterConfig(precision="highest"), DecoderConfig()))
    modes.append(("fast f32", FilterConfig(precision="fast"), DecoderConfig()))
    modes.append((
        "turbo bf16",
        FilterConfig(precision="fast"),
        dataclasses.replace(DecoderConfig(), recurrence_dtype="bfloat16"),
    ))

    filtered_golden = None
    if args.stages:
        if not GOLDEN_FILTERED.is_file():
            print("no reference_filtered.npz — run --write-filtered on CPU first")
        else:
            with np.load(GOLDEN_FILTERED, allow_pickle=False) as z:
                assert list(z["files"]) == list(ds.files)
                filtered_golden = z["filtered"]

    report = {"platform": jax.devices()[0].platform, "trials": len(ds),
              "device": jax.devices()[0].device_kind, "modes": {}}
    print(f"platform: {jax.devices()[0].platform} | trials: {len(ds)}")
    header = f"{'mode':14s} {'max|dlogit|':>12s} {'max|dprob|':>11s} {'argmax agree':>13s}"
    if filtered_golden is not None:
        header += f" {'filt max|d|':>12s} {'model-only |dlogit|':>20s}"
    print(header)
    for name, fcfg, dcfg in modes:
        # the serving front door: fast mode on TPU routes through the
        # fused Pallas operator kernel, exactly like the engines
        filt = jax.jit(lambda w, fcfg=fcfg: mai_filter_batch(w, fcfg))
        model = jax.jit(
            lambda p, f, dcfg=dcfg: decoder_apply(p, f, dcfg)
        )
        filtered = filt(ds.windows)
        logits = np.asarray(model(params, filtered))
        probs = np.asarray(jax.nn.softmax(logits, -1))
        dl = np.abs(logits - ref_logits).max()
        dp = np.abs(probs - golden["probs"]).max()
        agree = float((logits.argmax(1) == ref_argmax).mean())
        line = f"{name:14s} {dl:12.2e} {dp:11.2e} {agree:13.4f}"
        report["modes"][name] = {
            "max_dlogit": float(dl), "max_dprob": float(dp),
            "argmax_agreement": agree,
        }
        if filtered_golden is not None:
            dfilt = np.abs(np.asarray(filtered, np.float32) - filtered_golden).max()
            model_logits = np.asarray(model(params, filtered_golden))
            dmodel = np.abs(model_logits - ref_logits).max()
            line += f" {dfilt:12.2e} {dmodel:20.2e}"
            report["modes"][name].update(
                filter_max_delta=float(dfilt), model_only_max_dlogit=float(dmodel)
            )
        print(line)

    if args.json:
        import json
        from pathlib import Path as _P

        _P(args.json).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
