"""Trial orchestrator — the public `run_trials` API.

Signature and semantics parity with the reference's primary entry point
(reference: Neuro-Alpha-App/Utilities/tester.py:30-110):

  run_trials(trials=10, serial_port=..., num_channels=8,
             window_seconds=5.0, model_path=..., verbose=True)
      -> TrialResult(trials, avg_probs[3], avg_chunk[T, C])

  * spawns the streaming producer and sets its recording flag,
  * collects `trials` windows from a bounded drop-oldest queue with a 6.5 s
    consumer timeout and a producer-liveness check,
  * lazily builds the predictor from the *stream's* reported sample rate
    with the canonical hyperparameters (hidden 48, 2 layers, 3 classes,
    dropout 0.60, tailoring lambda 1.25e-29, class names
    ["Food", "Water", "None"] — reference quirks preserved),
  * averages softmax probabilities AND the raw (unfiltered) chunks — the
    chunk average intentionally uses unfiltered data, as the reference does
    (tester.py:90),
  * tears down via flag-off, stop(), join(5 s) in a finally block.

Differences: `serial_port` accepts board specs ("replay[:path]",
"synthetic", "native-replay", ...) or a Board instance, since real serial
hardware is absent here; `run_trials_ex` additionally returns latency /
throughput stats (the BASELINE.md north-star metrics).
"""

from __future__ import annotations

import os
import queue
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

from neural_speech_decoding_tpu.config import PipelineConfig
from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
from neural_speech_decoding_tpu.runtime.streaming import StreamingProducer
from neural_speech_decoding_tpu.utils.timing import LatencyStats

# The reference's hardware default ("/dev/cu.usbserial-FTB6SPL3",
# tester.py:17) is a macOS serial device we cannot open; our default board
# replays the shipped dataset in real time. Override with $NSD_BOARD.
DEFAULT_SERIAL = os.environ.get("NSD_BOARD", "replay")

_REFERENCE_MODEL = (
    "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
    "lstm_classifier_Water_Food_Bg_Noise.pth"
)


def default_model_path() -> str:
    env = os.environ.get("NSD_MODEL")
    if env:
        return env
    if Path(_REFERENCE_MODEL).is_file():
        return _REFERENCE_MODEL
    raise FileNotFoundError(
        "no decoder checkpoint: set $NSD_MODEL or pass model_path"
    )


@dataclass
class TrialResult:
    trials: int
    avg_probs: Optional[np.ndarray]
    avg_chunk: Optional[np.ndarray] = None


@dataclass
class RunStats:
    """Observability the reference lacked (SURVEY.md §5 'tracing')."""

    latency: LatencyStats = field(
        default_factory=lambda: LatencyStats(name="trial_to_prediction")
    )
    predict_latency: LatencyStats = field(
        default_factory=lambda: LatencyStats(name="predict_only")
    )
    wall_seconds: float = 0.0
    windows_per_second: float = 0.0
    labels: list = field(default_factory=list)


def run_trials_ex(
    trials: int = 10,
    serial_port=DEFAULT_SERIAL,
    num_channels: int = 8,
    window_seconds: float = 5.0,
    model_path: Optional[str] = None,
    verbose: bool = True,
    *,
    engine: Optional[InferenceEngine] = None,
    queue_timeout: float = 6.5,
    model: str = "lstm",
):
    """run_trials + RunStats. See module docstring for semantics.

    `model` selects the decoder family from the registry ("lstm" is the
    reference-parity default; "lstm5"/"eegnet"/"transformer" need a trained
    .npz checkpoint via model_path)."""
    if model_path is None and engine is None:
        model_path = default_model_path()

    q: "queue.Queue" = queue.Queue(maxsize=8)
    producer = StreamingProducer(
        serial_port,
        num_channels=num_channels,
        window_seconds=window_seconds,
        out_queue=q,
    )
    producer.start()
    producer.recording_flag.value = True

    stats = RunStats()
    collected = 0
    sum_probs: Optional[np.ndarray] = None
    sum_chunk: Optional[np.ndarray] = None
    t_start = time.perf_counter()

    try:
        while collected < trials:
            if not producer.is_alive():
                err = producer.error
                raise RuntimeError(
                    f"Producer exited unexpectedly{f': {err}' if err else ''}"
                )
            try:
                item = q.get(timeout=queue_timeout)
            except queue.Empty:
                if verbose:
                    print("Waiting for chunk...", flush=True)
                continue

            chunk = np.asarray(item["data"])
            sr = item["sr"]

            if engine is None:
                # canonical lazy construction with the stream's sr; the
                # reference-parity LSTM keeps this call site's class-name
                # spelling quirk (reference: tester.py:85)
                engine = InferenceEngine(
                    model_path,
                    config=PipelineConfig() if model == "lstm" else None,
                    class_names=("Food", "Water", "None") if model == "lstm" else None,
                    sample_rate=sr,
                    model=model,
                )

            t_pred0 = time.perf_counter()
            probs, label = engine.predict(chunk)
            t_done = time.perf_counter()
            stats.predict_latency.record(t_done - t_pred0)
            stats.latency.record(time.time() - item["t_emit"])
            stats.labels.append(label)

            if sum_probs is None:
                sum_probs = np.zeros(len(probs), dtype=np.float32)
            sum_probs += probs
            sum_chunk = chunk if sum_chunk is None else sum_chunk + chunk
            collected += 1

            if verbose:
                stamp = time.strftime("%H:%M:%S")
                print(
                    f"[Trial {collected:02d} @ {stamp}] pred={label} "
                    f"probs={np.round(probs, 3)}",
                    flush=True,
                )

        avg_probs = (sum_probs / collected) if collected else None
        avg_chunk = (
            (sum_chunk / collected)
            if (collected and sum_chunk is not None)
            else None
        )
        stats.wall_seconds = time.perf_counter() - t_start
        if stats.wall_seconds > 0:
            stats.windows_per_second = collected / stats.wall_seconds
        if verbose:
            if avg_probs is not None:
                print(f"\nAveraged over {collected} trials: {np.round(avg_probs, 3)}")
                print(str(stats.latency))
            else:
                print("No trials completed; no average available.")
        return TrialResult(trials=collected, avg_probs=avg_probs, avg_chunk=avg_chunk), stats
    finally:
        producer.recording_flag.value = False
        producer.stop()
        producer.join(timeout=5.0)


def run_trials(
    trials: int = 10,
    serial_port=DEFAULT_SERIAL,
    num_channels: int = 8,
    window_seconds: float = 5.0,
    model_path: Optional[str] = None,
    verbose: bool = True,
) -> TrialResult:
    """Reference-parity entry point (tester.py:30-37)."""
    result, _ = run_trials_ex(
        trials=trials,
        serial_port=serial_port,
        num_channels=num_channels,
        window_seconds=window_seconds,
        model_path=model_path,
        verbose=verbose,
    )
    return result


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description="Run a decoding snapshot")
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--board", default=DEFAULT_SERIAL,
                    help="board spec: replay[:path] | synthetic | native-replay | native-synthetic")
    ap.add_argument("--speed", type=float, default=1.0,
                    help="replay/synthetic time acceleration")
    ap.add_argument(
        "--model", default=None,
        help="checkpoint path (.pth or .npz), or a fit_ensemble "
             "*_manifest.json to serve the seed ensemble",
    )
    ap.add_argument(
        "--family", default="lstm",
        help="decoder family: lstm | lstm5 | eegnet | transformer | ...",
    )
    ap.add_argument(
        "--model-kw", action="append", default=[], metavar="KEY=VALUE",
        help="model-config override for the family (repeatable), e.g. "
             "--model-kw whiten=true for a whitened logcov checkpoint",
    )
    ap.add_argument(
        "--combine", default="mean", choices=("mean", "median"),
        help="ensemble member combiner (manifest serving only): mean is "
             "the deployed default; median is the robust alternative "
             "measured in docs/BENCHMARKS.md's combiner study",
    )
    ap.add_argument("--window-seconds", type=float, default=5.0)
    args = ap.parse_args()

    board = args.board
    if args.speed != 1.0:
        from neural_speech_decoding_tpu.runtime.board import open_board

        board = open_board(args.board, speed=args.speed)

    from neural_speech_decoding_tpu.models.registry import parse_model_kw

    model_kw = parse_model_kw(args.model_kw)

    engine = None
    if args.model and args.model.endswith(".json"):
        from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

        # explicit --model-kw overrides win over the manifest's recorded kw
        engine = EnsembleEngine.from_manifest(
            args.model, combine=args.combine,
            **({"model_kw": model_kw} if model_kw else {}),
        )
    elif model_kw:
        engine = InferenceEngine(
            args.model or default_model_path(),
            model=args.family,
            model_kw=model_kw,
            # reference class-name quirk preserved (reference tester.py:85)
            class_names=(
                ("Food", "Water", "None") if args.family == "lstm" else None
            ),
        )

    result, stats = run_trials_ex(
        trials=args.trials,
        serial_port=board,
        window_seconds=args.window_seconds,
        model_path=None if engine is not None else args.model,
        model=args.family,
        engine=engine,
    )
    print(f"windows/s: {stats.windows_per_second:.3f}  {stats.latency}")


if __name__ == "__main__":
    main()
