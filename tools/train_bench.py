"""On-chip training-step benchmark (VERDICT r3 #1).

Measures, per model family and configuration:
  * jit compile time of the full train step (value_and_grad + adam update)
    — through this image's remote TPU compile service the 625-step
    backprop-through-scan was the repo's one recorded unresolved gotcha,
  * steady-state steps/s and windows/s at given batch sizes (forced-fetch
    timing discipline: the tunnel's block_until_ready does not wait).

Families:
  lstm            reference-parity 2-layer LSTM, plus the remat/unroll
                  variants (DecoderConfig.remat_chunks / scan_unroll)
  tcn             dilated residual conv stack (fully parallel over T)
  logcov8         covariance flagship — BOTH the full-window path (band
                  covariances + Clenshaw logm inside the step) and the
                  feature-space head path crossval actually trains with
                  (featurize once, train in 288-dim head space)

  python tools/train_bench.py --families lstm,tcn,logcov8 \
      --batches 32,512 --iters 20 --json checkpoints/train_bench_r4.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def _time_compile_and_steps(step_fn, args_builder, batch, iters):
    """Returns (compile_s, steps_per_s, windows_per_s, first_loss)."""
    import jax

    args = args_builder()
    t0 = time.perf_counter()
    compiled = jax.jit(step_fn).lower(*args).compile()
    compile_s = time.perf_counter() - t0

    params, opt_state, x, y, rng = args
    # warm execution (the first run still pays transfer/init)
    params, opt_state, metrics = compiled(params, opt_state, x, y, rng)
    first_loss = float(np.asarray(metrics["loss"]))

    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, metrics = compiled(params, opt_state, x, y, rng)
    np.asarray(metrics["loss"])  # queue executes in order; fetch waits
    dt = time.perf_counter() - t0
    return compile_s, iters / dt, iters * batch / dt, first_loss


def bench_family(name, batch, iters, seed=0):
    """Yields result-row dicts for one family at one batch size."""
    import jax
    import jax.numpy as jnp
    import optax

    from neural_speech_decoding_tpu.config import DecoderConfig
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.train.loop import make_train_step

    rng0 = np.random.default_rng(seed)
    x_np = rng0.standard_normal((batch, 625, 8)).astype(np.float32)

    def builder_for(model_like, params, n_classes, x_arr):
        y_np = rng0.integers(0, n_classes, size=(x_arr.shape[0],)).astype(
            np.int32
        )
        opt = optax.adam(1e-3)
        step = make_train_step(model_like, opt, label_smoothing=0.1)

        def build():
            return (
                jax.device_put(params),
                jax.device_put(opt.init(params)),
                jnp.asarray(x_arr),
                jnp.asarray(y_np),
                jax.random.PRNGKey(7),
            )

        return step, build

    if name == "lstm":
        variants = {
            "lstm": {},
            "lstm_remat25": {"remat_chunks": 25},
            "lstm_unroll5": {"scan_unroll": 5},
            "lstm_remat25_unroll5": {"remat_chunks": 25, "scan_unroll": 5},
        }
        for label, kw in variants.items():
            cfg = DecoderConfig(**kw)
            from neural_speech_decoding_tpu.models.lstm import (
                init_decoder_params,
            )

            params = init_decoder_params(jax.random.PRNGKey(0), cfg)
            step, build = builder_for(cfg, params, cfg.num_classes, x_np)
            c, sps, wps, loss = _time_compile_and_steps(
                step, build, batch, iters
            )
            yield {
                "config": label, "batch": batch, "compile_s": round(c, 1),
                "steps_per_s": round(sps, 2), "windows_per_s": round(wps, 1),
                "loss": round(loss, 4),
            }
    elif name == "logcov8":
        spec = get_model("logcov8", whiten=True)
        params = spec.fit(spec.init(jax.random.PRNGKey(0)), x_np[:64])
        step, build = builder_for(spec, params, 3, x_np)
        c, sps, wps, loss = _time_compile_and_steps(step, build, batch, iters)
        yield {
            "config": "logcov8_fullwindow", "batch": batch,
            "compile_s": round(c, 1), "steps_per_s": round(sps, 2),
            "windows_per_s": round(wps, 1), "loss": round(loss, 4),
        }
        # the feature-space path crossval trains with: featurize once,
        # steps run in 288-dim head space
        feats = np.asarray(jax.jit(spec.featurize)(params, jnp.asarray(x_np)))
        head = lambda p, f, *, train=False, rng=None: spec.head_apply(  # noqa: E731
            p, f, train=train, rng=rng
        )
        step, build = builder_for(head, params, 3, feats)
        c, sps, wps, loss = _time_compile_and_steps(step, build, batch, iters)
        yield {
            "config": "logcov8_feature_head", "batch": batch,
            "compile_s": round(c, 1), "steps_per_s": round(sps, 2),
            "windows_per_s": round(wps, 1), "loss": round(loss, 4),
        }
    else:
        spec = get_model(name)
        params = spec.init(jax.random.PRNGKey(0))
        step, build = builder_for(spec, params, len(spec.class_names), x_np)
        c, sps, wps, loss = _time_compile_and_steps(step, build, batch, iters)
        yield {
            "config": name, "batch": batch, "compile_s": round(c, 1),
            "steps_per_s": round(sps, 2), "windows_per_s": round(wps, 1),
            "loss": round(loss, 4),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="lstm,tcn,logcov8")
    ap.add_argument("--batches", default="32,512")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    device = jax.devices()[0].device_kind
    rows = []
    print(f"device: {device}")
    print(f"{'config':<22} {'batch':>6} {'compile_s':>10} {'steps/s':>9} "
          f"{'windows/s':>10}")
    for batch in [int(b) for b in args.batches.split(",")]:
        for fam in args.families.split(","):
            for row in bench_family(fam.strip(), batch, args.iters):
                row["device"] = device
                rows.append(row)
                print(
                    f"{row['config']:<22} {row['batch']:>6} "
                    f"{row['compile_s']:>10.1f} {row['steps_per_s']:>9.2f} "
                    f"{row['windows_per_s']:>10,.0f}",
                    flush=True,
                )
                if args.json:
                    # incremental: a late-family timeout must not lose
                    # the rows already measured (compiles cost minutes)
                    Path(args.json).write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
