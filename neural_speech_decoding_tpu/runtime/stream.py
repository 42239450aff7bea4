"""Continuous streaming decoder.

BASELINE.json config 5 ("Streaming real-time pipeline: replay -> sliding
windows -> 10-trial averaged softmax") as a first-class runtime: a board
feeds sliding windows (hop < window for overlap), the decode of window i+1
is dispatched while window i's result is being fetched (XLA async dispatch
does the overlap — the host never blocks on an idle device), and
probabilities are folded into a rolling N-window average, the streaming
form of the reference's 10-trial snapshot (reference: tester.py:88-98).

The reference's architecture blocks ~50 s to produce one averaged
prediction; this produces one every hop, each reflecting the trailing N
windows, with per-window latency recorded from sample-complete to
probability-ready.
"""

from __future__ import annotations

import collections
import os
import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional

import numpy as np

from neural_speech_decoding_tpu.runtime.board import Board, open_board
from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
from neural_speech_decoding_tpu.utils.timing import LatencyStats


@dataclass
class StreamPrediction:
    index: int
    probs: np.ndarray  # this window's probabilities
    avg_probs: np.ndarray  # rolling average over the last N windows
    label: str
    t_window: float  # wall time the window was complete on the host
    t_ready: float  # wall time the probabilities were available
    counter: int  # board sample counter at window end


@dataclass
class StreamStats:
    latency: LatencyStats = field(
        default_factory=lambda: LatencyStats(name="window_to_prediction")
    )
    windows: int = 0
    wall_seconds: float = 0.0

    @property
    def windows_per_second(self) -> float:
        return self.windows / self.wall_seconds if self.wall_seconds else 0.0


class StreamDecoder:
    def __init__(
        self,
        engine: InferenceEngine,
        board_or_spec,
        window_seconds: float = 5.0,
        hop_seconds: float = 1.0,
        average_n: int = 10,
    ):
        self.engine = engine
        # spec strings / paths open a board; anything else is used as-is
        # (includes duck-typed adapters that are not Board subclasses)
        self.board: Board = (
            open_board(str(board_or_spec))
            if isinstance(board_or_spec, (str, os.PathLike))
            else board_or_spec
        )
        self.window_seconds = float(window_seconds)
        self.hop_seconds = float(hop_seconds)
        self.average_n = int(average_n)

    def run(
        self,
        n_predictions: int,
        on_prediction: Optional[Callable[[StreamPrediction], None]] = None,
        timeout: float = 300.0,
        warm: bool = True,
    ) -> tuple[List[StreamPrediction], StreamStats]:
        """Stream until `n_predictions` sliding windows are decoded."""
        board = self.board
        owns_session = not board._streaming
        if owns_session:
            board.prepare_session()
            board.start_stream()
        try:
            return self._run(n_predictions, on_prediction, timeout, warm)
        finally:
            if owns_session:
                board.stop_stream()
                board.release_session()

    def _run(self, n_predictions, on_prediction, timeout, warm):
        board = self.board
        fs = board.get_sampling_rate(board.get_board_id())
        n = max(1, int(self.window_seconds * fs))
        hop = max(1, int(self.hop_seconds * fs))
        speed = getattr(board, "speed", 1.0)

        if warm:
            self.engine.warmup([1])

        stats = StreamStats()
        preds: List[StreamPrediction] = []
        history: "collections.deque" = collections.deque(maxlen=self.average_n)
        pending = None  # (future, index, t_window, counter)
        next_counter = None
        deadline = time.time() + timeout
        t_start = time.perf_counter()
        index = 0

        def finish(p):
            future, idx, t_window, counter = p
            probs = np.asarray(future)[0]
            t_ready = time.time()
            history.append(probs)
            avg = np.mean(np.stack(history), axis=0)
            pred = StreamPrediction(
                index=idx,
                probs=probs.astype(np.float32),
                avg_probs=avg.astype(np.float32),
                label=self.engine.class_names[int(np.argmax(probs))],
                t_window=t_window,
                t_ready=t_ready,
                counter=counter,
            )
            stats.latency.record(t_ready - t_window)
            stats.windows += 1
            preds.append(pred)
            if on_prediction is not None:
                on_prediction(pred)

        while len(preds) < n_predictions and time.time() < deadline:
            data = board.get_current_board_data(n)
            if data.shape[1] < n:
                time.sleep(0.005)
                continue
            counter = int(data[0, -1])
            if next_counter is not None and counter < next_counter:
                # wait for the next hop's worth of fresh samples; fetch the
                # pending result in the meantime instead of spinning
                if pending is not None:
                    finish(pending)
                    pending = None
                time.sleep(min(0.005, self.hop_seconds / (10 * speed)))
                continue
            next_counter = counter + hop

            window = np.ascontiguousarray(
                data[board.eeg_channels, :].T, dtype=np.float32
            )
            t_window = time.time()
            # pipelined: dispatch this window, then fetch the previous one
            future = self.engine.predict_batch_async(window[None])
            if pending is not None:
                finish(pending)
            pending = (future, index, t_window, counter)
            index += 1

        if pending is not None and len(preds) < n_predictions:
            finish(pending)
        stats.wall_seconds = time.perf_counter() - t_start
        return preds, stats


def main() -> None:
    import argparse

    from neural_speech_decoding_tpu.runtime.tester import default_model_path

    ap = argparse.ArgumentParser(description="Continuous streaming decode")
    ap.add_argument("--board", default="replay")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--predictions", type=int, default=20)
    ap.add_argument("--window-seconds", type=float, default=5.0)
    ap.add_argument("--hop-seconds", type=float, default=1.0)
    ap.add_argument("--average-n", type=int, default=10)
    ap.add_argument("--model", default=None)
    ap.add_argument("--family", default="lstm")
    args = ap.parse_args()

    engine = InferenceEngine(
        args.model or default_model_path(), model=args.family,
        class_names=("Food", "Water", "None") if args.family == "lstm" else None,
    )
    board = open_board(args.board, speed=args.speed)
    dec = StreamDecoder(
        engine, board, window_seconds=args.window_seconds,
        hop_seconds=args.hop_seconds, average_n=args.average_n,
    )
    preds, stats = dec.run(
        args.predictions,
        on_prediction=lambda p: print(
            f"[{p.index:03d}] {p.label:8s} probs={np.round(p.probs, 3)} "
            f"avg={np.round(p.avg_probs, 3)} "
            f"latency={(p.t_ready - p.t_window) * 1e3:.1f}ms",
            flush=True,
        ),
    )
    print(f"\n{stats.windows} windows, {stats.windows_per_second:.2f}/s, {stats.latency}")


if __name__ == "__main__":
    main()
