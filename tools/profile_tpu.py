"""Decompose TPU pipeline cost: filter vs LSTM, XLA scan vs Pallas kernel.

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
from neural_speech_decoding_tpu.ops.pallas.lstm import decoder_apply_pallas

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
    ap.add_argument("--blocks", default="256:25,512:25,128:125,1024:25,256:125,2048:5")
    args = ap.parse_args()

    params = jax.device_put(load_decoder_params(CKPT))
    windows = load_trials().windows
    reps = int(np.ceil(args.batch / windows.shape[0]))
    batch = jnp.asarray(np.tile(windows, (reps, 1, 1))[: args.batch])
    fcfg = FilterConfig(precision="fast")
    dcfg = DecoderConfig()
    b = args.batch

    trivial = jax.jit(lambda x: x + 1.0)
    rtt = bench(trivial, jnp.ones((8, 8)), iters=5)
    print(f"tunnel rtt ~{rtt * 1e3:.1f} ms (subtract from everything below)")

    filter_fn = jax.jit(
        lambda w: jnp.sum(jax.vmap(lambda x: mai_filter(x, fcfg))(w), axis=(1, 2))
    )
    lstm_fn = jax.jit(lambda p, w: decoder_apply(p, w, dcfg))
    full_fn = jax.jit(
        lambda p, w: jax.nn.softmax(
            decoder_apply(p, jax.vmap(lambda x: mai_filter(x, fcfg))(w), dcfg), -1
        )
    )

    filtered = jnp.asarray(
        np.asarray(jax.jit(lambda w: jax.vmap(lambda x: mai_filter(x, fcfg))(w))(batch))
    )

    t_filter = bench(filter_fn, batch)
    t_lstm = bench(lstm_fn, params, filtered)
    t_full = bench(full_fn, params, batch)
    print(f"B={b}")
    print(f"  filter-only : {t_filter * 1e3:8.2f} ms  ({b / t_filter:10.0f} w/s)")
    print(f"  lstm(scan)  : {t_lstm * 1e3:8.2f} ms  ({b / t_lstm:10.0f} w/s)")
    print(f"  full(scan)  : {t_full * 1e3:8.2f} ms  ({b / t_full:10.0f} w/s)")

    ref_logits = np.asarray(lstm_fn(params, filtered[:256]))
    for spec in args.blocks.split(","):
        bb, bt = (int(v) for v in spec.split(":"))
        if b % bb:
            continue
        try:
            pal = jax.jit(
                lambda p, w, bb=bb, bt=bt: decoder_apply_pallas(
                    p, w, dcfg, block_b=bb, block_t=bt
                )
            )
            t_pal = bench(pal, params, filtered)
            got = np.asarray(pal(params, filtered[:256] if bb <= 256 else filtered))[
                :256
            ]
            ok = np.abs(got - ref_logits).max() < 1e-3
            print(
                f"  lstm(pallas {bb}x{bt}): {t_pal * 1e3:8.2f} ms "
                f"({b / t_pal:10.0f} w/s) match={ok}"
            )
        except Exception as e:
            print(f"  lstm(pallas {bb}x{bt}): FAIL {str(e)[:110]}")

    # full pipeline with pallas decoder
    try:
        full_pal = jax.jit(
            lambda p, w: jax.nn.softmax(
                decoder_apply_pallas(
                    p, jax.vmap(lambda x: mai_filter(x, fcfg))(w), dcfg,
                    block_b=min(256, b), block_t=25,
                ),
                -1,
            )
        )
        t_fp = bench(full_pal, params, batch)
        print(f"  full(pallas): {t_fp * 1e3:8.2f} ms  ({b / t_fp:10.0f} w/s)")
    except Exception as e:
        print(f"  full(pallas): FAIL {str(e)[:110]}")

    # batch-1 latency (dominated by tunnel rtt here; device time = delta)
    one = batch[:1]
    t1 = bench(full_fn, params, one, iters=10)
    try:
        pal1 = jax.jit(
            lambda p, w: jax.nn.softmax(
                decoder_apply_pallas(
                    p, jax.vmap(lambda x: mai_filter(x, fcfg))(w), dcfg,
                    block_b=1, block_t=125,
                ),
                -1,
            )
        )
        t1p = bench(pal1, params, one, iters=10)
    except Exception as e:
        t1p = float("nan")
        print("  pallas batch-1 FAIL:", str(e)[:110])
    print(f"  batch-1 full: scan {t1 * 1e3:.2f} ms | pallas {t1p * 1e3:.2f} ms | rtt {rtt * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
