"""Decompose TPU pipeline cost: filter vs LSTM scan vs full pipeline.

Timing note: through the axon tunnel `block_until_ready` does NOT wait for
remote execution — every measurement here forces a host transfer
(np.asarray) per iteration; `--rtt` reports the tunnel round-trip to
subtract mentally. Run on a free chip:

  python tools/profile_tpu.py [--batch 4096]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax
import jax.numpy as jnp

from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
from neural_speech_decoding_tpu.io.dataset import load_trials
from neural_speech_decoding_tpu.models.lstm import decoder_apply
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter

CKPT = (
    "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
    "lstm_classifier_Water_Food_Bg_Noise.pth"
)


def bench(fn, *args, iters=3):
    _ = np.asarray(fn(*args))  # warm/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    params = jax.device_put(load_decoder_params(CKPT))
    windows = load_trials().windows
    reps = int(np.ceil(args.batch / windows.shape[0]))
    batch = jnp.asarray(np.tile(windows, (reps, 1, 1))[: args.batch])
    fcfg = FilterConfig(precision="fast")
    dcfg = DecoderConfig()
    b = args.batch

    import dataclasses

    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch

    trivial = jax.jit(lambda x: x + 1.0)
    rtt = bench(trivial, jnp.ones((8, 8)), iters=5)
    print(f"tunnel rtt ~{rtt * 1e3:.1f} ms (subtract from everything below)")

    filter_stages = jax.jit(
        lambda w: jnp.sum(jax.vmap(lambda x: mai_filter(x, fcfg))(w), axis=(1, 2))
    )
    # the serving front door: fused Pallas operator kernel on TPU
    filter_kernel = jax.jit(
        lambda w: jnp.sum(mai_filter_batch(w, fcfg), axis=(1, 2))
    )
    full_fn = jax.jit(
        lambda p, w: jax.nn.softmax(
            decoder_apply(p, mai_filter_batch(w, fcfg), dcfg), -1
        )
    )

    filtered = jnp.asarray(np.asarray(mai_filter_batch(batch, fcfg)))

    print(f"B={b}")
    for name, fn in (("stages", filter_stages), ("kernel", filter_kernel)):
        t = bench(fn, batch)
        print(f"  filter({name:6s}): {t * 1e3:8.2f} ms  ({b / t:10.0f} w/s)")

    # eval-scan variants: streaming (default), materializing fused,
    # per-layer, and the bf16 turbo recurrence on the streaming scan
    scan_cfgs = (
        ("stream", dcfg),
        ("fused", dataclasses.replace(dcfg, streaming_scan=False)),
        ("per-layer", dataclasses.replace(
            dcfg, fused_scan=False, streaming_scan=False)),
        ("bf16-stream", dataclasses.replace(
            dcfg, recurrence_dtype="bfloat16")),
    )
    for name, cfg in scan_cfgs:
        fn = jax.jit(lambda p, w, cfg=cfg: decoder_apply(p, w, cfg))
        try:
            t = bench(fn, params, filtered)
            print(f"  lstm({name:9s}): {t * 1e3:8.2f} ms  ({b / t:10.0f} w/s)")
        except Exception as e:
            print(f"  lstm({name:9s}): FAIL {str(e)[:110]}")

    t_full = bench(full_fn, params, batch)
    print(f"  full(default) : {t_full * 1e3:8.2f} ms  ({b / t_full:10.0f} w/s)")

    # batch-1 latency (dominated by tunnel rtt here; device time = delta)
    one = batch[:1]
    t1 = bench(full_fn, params, one, iters=10)
    print(f"  batch-1 full: {t1 * 1e3:.2f} ms | rtt {rtt * 1e3:.2f} ms")


def main_logcov():
    """Decompose the accuracy flagship (whitened logcov8): band
    covariances (fft vs matmul spectral), whiten+guard, logm backends,
    and a Chebyshev degree/interval sweep — the data for any fused
    front-end or reduced-degree decision. `python tools/profile_tpu.py
    --logcov [--batch N]`."""
    import dataclasses

    from neural_speech_decoding_tpu.models import logcov as lc

    ap = argparse.ArgumentParser()
    ap.add_argument("--logcov", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--degrees", default="128,160,200,256,320")
    args = ap.parse_args()
    b = args.batch

    windows = load_trials().windows
    reps = int(np.ceil(b / windows.shape[0]))
    fcfg = FilterConfig(precision="fast")
    raw = jnp.asarray(np.tile(windows, (reps, 1, 1))[:b])
    batch = jnp.asarray(
        np.asarray(jax.jit(lambda w: jax.vmap(lambda x: mai_filter(x, fcfg))(w))(raw))
    )

    trivial = jax.jit(lambda x: x + 1.0)
    rtt = bench(trivial, jnp.ones((8, 8)), iters=5)
    print(f"tunnel rtt ~{rtt * 1e3:.1f} ms; B={b} (MAI-filtered inputs)")

    from neural_speech_decoding_tpu.models.registry import get_model

    spec = get_model("logcov8", whiten=True)
    cfg = spec.config
    params = spec.fit(spec.init(jax.random.PRNGKey(0)), batch[:512])
    whitener = params["whitener"]

    for spectral in ("fft", "matmul"):
        c2 = dataclasses.replace(cfg, spectral=spectral)
        fn = jax.jit(lambda w, c2=c2: jnp.sum(lc.band_covariances(w, c2)))
        t = bench(fn, batch)
        print(f"  band_cov[{spectral:6s}] : {t * 1e3:8.2f} ms ({b / t:10.0f} w/s)")

    covs = jax.jit(lambda w: lc.band_covariances(w, cfg))(batch)
    covs = jnp.asarray(np.asarray(covs))

    wfn = jax.jit(
        lambda s: jnp.sum(jnp.einsum("nij,bnjk,nkl->bnil", whitener, s, whitener))
    )
    print(f"  whiten einsum    : {bench(wfn, covs) * 1e3:8.2f} ms")
    gfn = jax.jit(lambda s: jnp.sum(lc.guard_spectrum(s, cfg)[0]))
    print(f"  guard (cholesky) : {bench(gfn, covs) * 1e3:8.2f} ms")

    # logm backends on the whitened covariances
    wcovs = jax.jit(
        lambda s: jnp.einsum("nij,bnjk,nkl->bnil", whitener, s, whitener)
    )(covs)
    wcovs = jnp.asarray(np.asarray(wcovs))
    from neural_speech_decoding_tpu.ops.pallas.logm import logm_spd_chebyshev_pallas

    interp = jax.default_backend() != "tpu"  # CPU smoke runs use interpret

    for name, make in (
        ("eigh", lambda d: jax.jit(lambda s: jnp.sum(
            jnp.linalg.eigh(s)[0]))),
        ("cheb_scan", lambda d: jax.jit(lambda s, d=d: jnp.sum(
            lc._logm_spd_chebyshev(s, dataclasses.replace(cfg, cheb_degree=d))))),
        ("cheb_pallas", lambda d: jax.jit(lambda s, d=d: jnp.sum(
            logm_spd_chebyshev_pallas(
                s, lc._cheb_log_coeffs(*cfg.cheb_interval, d),
                *cfg.cheb_interval, interpret=interp)))),
    ):
        degrees = (
            [int(x) for x in args.degrees.split(",")]
            if name != "eigh" else [0]
        )
        for d in degrees:
            try:
                t = bench(make(d), wcovs)
                tag = f"{name}@{d}" if d else name
                print(f"  logm[{tag:14s}]: {t * 1e3:8.2f} ms ({b / t:10.0f} w/s)")
            except Exception as e:
                print(f"  logm[{name}@{d}]: FAIL {str(e)[:100]}")
            if name == "cheb_scan" and d != degrees[-1]:
                break  # scan is slow; one degree suffices for scale

    # degree sweep accuracy: kernel features vs f64 eigh ground truth on
    # REAL whitened covariances (max |delta| over upper-triangle entries)
    small = np.asarray(wcovs[:2048], np.float64)
    w64, v64 = np.linalg.eigh(small)
    exact = np.einsum("...ij,...j,...kj->...ik", v64,
                      np.log(np.maximum(w64, 1e-12)), v64)
    for d in [int(x) for x in args.degrees.split(",")]:
        got = np.asarray(
            jax.jit(lambda s, d=d: logm_spd_chebyshev_pallas(
                s, lc._cheb_log_coeffs(*cfg.cheb_interval, d),
                *cfg.cheb_interval, interpret=interp))(
                jnp.asarray(small, jnp.float32))
        )
        print(f"  degree {d:3d}: max|logm err| {np.abs(got - exact).max():.2e}")

    # end-to-end whitened features: round-3 stages pipeline (Pallas grams
    # -> padded [B, nb, 8, 8] shrinkage/guard in XLA -> Pallas Clenshaw)
    # vs the round-4 fused lane-major kernel (ops/pallas/logmfeats.py,
    # everything in gram pair-rows layout)
    import os as _os

    if interp:
        _os.environ["NSD_FUSED_INTERPRET"] = "1"
    for fused in ("stages", "kernel"):
        c2 = dataclasses.replace(cfg, fused=fused)
        fn = jax.jit(
            lambda w, c2=c2: jnp.sum(lc.logcov_features(w, c2, whitener))
        )
        try:
            t = bench(fn, batch)
            print(
                f"  features[{fused:6s}] : {t * 1e3:8.2f} ms "
                f"({b / t:10.0f} w/s)"
            )
        except Exception as e:
            print(f"  features[{fused}]: FAIL {str(e)[:120]}")
    try:
        sub = batch[:2048]
        f_st = np.asarray(jax.jit(
            lambda w: lc.logcov_features(
                w, dataclasses.replace(cfg, fused="stages"), whitener)
        )(sub))
        f_kn = np.asarray(jax.jit(
            lambda w: lc.logcov_features(
                w, dataclasses.replace(cfg, fused="kernel"), whitener)
        )(sub))
        print(
            "  features fused-vs-stages max delta: "
            f"{np.abs(f_st - f_kn).max():.2e} "
            f"(scale {np.abs(f_st).max():.1f})"
        )
    except Exception as e:
        print(f"  features parity: FAIL {str(e)[:120]}")


def main_lru():
    """LRU family: chunked-kernel vs associative-scan recurrence engines
    (models/lru.py, round 4). `python tools/profile_tpu.py --lru
    [--batch N]` — full decode pipeline (filter + lru_apply) plus the
    states-only stage, with cross-engine agreement checked on-chip."""
    import dataclasses

    from neural_speech_decoding_tpu.models import lru as m

    ap = argparse.ArgumentParser()
    ap.add_argument("--lru", action="store_true")
    ap.add_argument("--batch", type=int, default=16384)
    ap.add_argument("--chunks", default="25,125")
    args = ap.parse_args()
    b = args.batch

    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch

    windows = load_trials().windows
    reps = int(np.ceil(b / windows.shape[0]))
    fcfg = FilterConfig(precision="fast")
    raw = jnp.asarray(np.tile(windows, (reps, 1, 1))[:b])
    filtered = jnp.asarray(np.asarray(mai_filter_batch(raw, fcfg)))

    trivial = jax.jit(lambda x: x + 1.0)
    rtt = bench(trivial, jnp.ones((8, 8)), iters=5)
    print(f"tunnel rtt ~{rtt * 1e3:.1f} ms; B={b}")

    params = m.init_lru_params(jax.random.PRNGKey(0), m.LRUConfig())

    ref_logits = None
    for label, cfg in [
        ("associative", m.LRUConfig(scan_impl="associative")),
    ] + [
        (f"chunked@{c}", m.LRUConfig(scan_impl="chunked", chunk=int(c)))
        for c in args.chunks.split(",")
    ]:
        states_fn = jax.jit(
            lambda p, w, cfg=cfg: jnp.sum(
                jnp.abs(m._lru_states(p, w, cfg)) ** 2
            )
        )
        apply_fn = jax.jit(
            lambda p, w, cfg=cfg: m.lru_apply(p, w, cfg, train=False)
        )
        t_states = bench(states_fn, params, filtered)
        t_apply = bench(apply_fn, params, filtered)
        logits = np.asarray(apply_fn(params, filtered[:256]))
        if ref_logits is None:
            ref_logits = logits
            tag = ""
        else:
            tag = f"  max|dlogit|={np.abs(logits - ref_logits).max():.1e}"
        print(
            f"  {label:<14} states {t_states * 1e3:8.2f} ms "
            f"({b / t_states:9.0f} w/s) | full {t_apply * 1e3:8.2f} ms "
            f"({b / t_apply:9.0f} w/s){tag}"
        )

    # end-to-end decode (filter + lru) for the serving-table row — through
    # the serving front door (fused Pallas filter kernel on TPU)
    full = jax.jit(
        lambda p, w: jax.nn.softmax(
            m.lru_apply(
                p, mai_filter_batch(w, fcfg), m.LRUConfig(), train=False
            ),
            -1,
        )
    )
    t = bench(full, params, raw)
    print(f"  pipeline(chunked default): {t * 1e3:8.2f} ms ({b / t:9.0f} w/s)")


if __name__ == "__main__":
    if "--logcov" in sys.argv:
        main_logcov()
    elif "--lru" in sys.argv:
        main_lru()
    else:
        main()
