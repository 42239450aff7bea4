"""End-to-end quickstart: every major surface of the framework in one file.

  python examples/quickstart.py [--cpu]

Walks through: dataset load -> checkpoint ingest -> batched decode ->
reference-parity run_trials over a replay board -> continuous streaming
decode -> bulk recording decode -> filter-quality metrics.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from neural_speech_decoding_tpu.analysis.metrics import (
        compute_filter_metrics,
        format_metrics,
    )
    from neural_speech_decoding_tpu.config import FilterConfig
    from neural_speech_decoding_tpu.io.dataset import load_trials
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
    from neural_speech_decoding_tpu.runtime.board import ReplayBoard
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
    from neural_speech_decoding_tpu.runtime.stream import StreamDecoder
    from neural_speech_decoding_tpu.runtime.tester import (
        default_model_path,
        run_trials_ex,
    )

    print(f"backend: {jax.devices()[0].platform} ({jax.devices()[0].device_kind})")

    # 1. data + model
    ds = load_trials()
    print(f"dataset: {len(ds)} trials {dict(zip(ds.class_prefixes, ds.class_counts()))}")
    engine = InferenceEngine(default_model_path(),
                             class_names=("Food", "Water", "None"))
    engine.warmup([1])

    # 2. batched decode
    probs = engine.predict_batch(ds.windows[:16])
    acc = float((probs.argmax(1) == ds.labels[:16]).mean())
    print(f"batched decode: 16 windows, accuracy vs labels {acc:.2f}")

    # 3. reference-parity snapshot over an accelerated replay board
    board = ReplayBoard(ds.windows[:5], speed=64.0)
    result, stats = run_trials_ex(
        trials=5, serial_port=board, verbose=False, engine=engine
    )
    print(
        f"run_trials: {result.trials} trials, avg_probs "
        f"{np.round(result.avg_probs, 3)}, {stats.latency}"
    )

    # 4. continuous streaming decode (sliding windows)
    dec = StreamDecoder(engine, ReplayBoard(ds.windows[:5], speed=64.0),
                        hop_seconds=1.0, average_n=5)
    preds, sstats = dec.run(5, timeout=120)
    print(f"stream: {len(preds)} predictions, {sstats.latency}")

    # 5. bulk recording decode
    recording = np.concatenate(list(ds.windows[:6]), axis=0)
    rec_probs, starts = engine.decode_recording(recording, hop_seconds=2.5)
    print(f"recording decode: {rec_probs.shape[0]} windows from "
          f"{recording.shape[0] / 125:.0f}s of signal")

    # 6. filter-quality metrics
    raw = ds.windows[0]
    filt = np.asarray(mai_filter_batch(raw[None], FilterConfig(precision='fast')))[0]
    m = compute_filter_metrics(raw.T.astype(np.float64),
                               filt.T.astype(np.float64), fs=125.0)
    print("filter:", format_metrics(m))

    # 7. the accuracy flagship: the deployed 5-seed whitened-logcov
    # ensemble (members share one whitener, so features are extracted
    # once and only the heads are vmapped — K-member serving at
    # ~single-model cost). Skipped if the checkout has no checkpoints.
    manifest = (Path(__file__).resolve().parents[1]
                / "checkpoints" / "logcov8wd_ens_manifest.json")
    if manifest.is_file():
        from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

        ens = EnsembleEngine.from_manifest(str(manifest))
        eprobs = ens.predict_batch(ds.windows[:16])
        eacc = float((eprobs.argmax(1) == ds.labels[:16]).mean())
        print(f"ensemble decode: {ens.num_members} members "
              f"(shared featurization: {ens._shared_featurize}), "
              f"16-window accuracy {eacc:.2f}, "
              f"guard stats {ens.stats}")


if __name__ == "__main__":
    main()
