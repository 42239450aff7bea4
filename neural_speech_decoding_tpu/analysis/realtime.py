"""Real-time filter analysis CLI — headless equivalent of the reference's
live demo (reference: MindsAI/examples/Minds_AI_Filter_Real-time_Signal_
Analysis.py): stream from a board (synthetic by default), roll fixed
windows, optionally inject noise (burst/flatline/sine/white), detrend ->
Kuramoto filter -> per-window SNR console lines.

  python -m neural_speech_decoding_tpu.analysis.realtime \
      --board synthetic --speed 16 --windows 10 --inject burst
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from neural_speech_decoding_tpu.analysis.metrics import (
    compute_filter_metrics,
    format_metrics,
)
from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter
from neural_speech_decoding_tpu.runtime.board import open_board
from neural_speech_decoding_tpu.train.augment import KINDS, inject_noise_np


def run_realtime(
    board,
    n_windows: int = 10,
    window_seconds: float = 1.0,
    lambd: float = 1e-25,
    channel: int = 0,
    inject: str = "",
    seed: int = 0,
    on_window=None,
    timeout: float = 120.0,
):
    """Stream `n_windows` windows and return their metrics list."""
    import jax

    rng = np.random.default_rng(seed)
    fs = board.get_sampling_rate(board.get_board_id())
    n = max(1, int(window_seconds * fs))
    speed = getattr(board, "speed", 1.0)
    cfg = FilterConfig(lambd=lambd)
    # jit the window filter: unjitted jnp dispatches op-by-op, which is
    # catastrophic through a remote-device tunnel
    filt_fn = jax.jit(lambda x: mai_filter(x, cfg))

    results = []
    deadline = time.time() + timeout
    last_count = -1
    while len(results) < n_windows and time.time() < deadline:
        if board.get_board_data_count() < n:
            time.sleep(0.01)
            continue
        data = board.get_current_board_data(n)
        count = int(data[0, -1])  # counter row: skip duplicate windows
        if count == last_count:
            time.sleep(window_seconds / (10 * speed))
            continue
        last_count = count

        eeg_tc = data[board.eeg_channels, :].T.astype(np.float64)  # [T, C]
        if inject:
            eeg_tc = inject_noise_np(eeg_tc, inject, rng, strength=2.0)
        raw_tc = eeg_tc - eeg_tc.mean(axis=0, keepdims=True)
        filt_tc = np.asarray(filt_fn(raw_tc.astype(np.float32)))
        m = compute_filter_metrics(
            raw_tc.T, filt_tc.T.astype(np.float64), fs=fs, channel=channel,
            lambd=lambd,
        )
        results.append(m)
        if on_window is not None:
            on_window(len(results) - 1, m)
    return results


def main() -> None:
    ap = argparse.ArgumentParser(description="Real-time Kuramoto-filter analysis")
    ap.add_argument("--board", default="synthetic")
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--window-seconds", type=float, default=1.0)
    ap.add_argument("--lambda", dest="lambd", type=float, default=1e-25)
    ap.add_argument("--channel", type=int, default=0)
    ap.add_argument("--inject", default="", choices=("",) + KINDS)
    args = ap.parse_args()

    board = open_board(args.board, speed=args.speed)
    board.prepare_session()
    board.start_stream()
    try:
        run_realtime(
            board,
            n_windows=args.windows,
            window_seconds=args.window_seconds,
            lambd=args.lambd,
            channel=args.channel,
            inject=args.inject,
            on_window=lambda i, m: print(f"win {i:03d} {format_metrics(m)}", flush=True),
        )
    finally:
        board.stop_stream()
        board.release_session()


if __name__ == "__main__":
    main()
