"""Collection-side recording chain.

Reproduces what the reference's RecordingProcess does on a recording-flag
rising edge (reference: Neural_decoding_data_collector.py:97-142): grab the
last 625 samples from the board, run the per-channel filter chain (constant
detrend + 40/50/60 Hz bandstops + 3-48 Hz bandpass, zero-phase), round to
7 decimals, normalize -0 to 0, and append the transposed [625, 8] window to
`<class>_<uuid4>.csv` as "%.7f" CSV rows.

Note the reference hard-codes the filename prefix `backgroundnoise_`
(collector :105 — SURVEY.md fidelity trap); here the label argument is
honored, with the reference behavior available via label="backgroundnoise".

The filter chain itself is the jitted batched JAX kernel in ops/iir.py —
recording N trials costs one device dispatch, not N * C Python DSP calls.
"""

from __future__ import annotations

import uuid
from pathlib import Path
from typing import Optional

import numpy as np

from neural_speech_decoding_tpu.ops.iir import collector_filter_chain_batch


def preprocess_trial(
    raw_tc: np.ndarray, fs: float = 125.0, padtype: Optional[str] = None
) -> np.ndarray:
    """Filter one raw [T, C] window and apply the reference's rounding
    (7 decimals, -0 -> 0).

    padtype=None (default) is the pad-free zero-phase pass — BrainFlow's
    BUTTERWORTH_ZERO_PHASE behavior, which is what produced the shipped
    dataset (reference: Neural_decoding_data_collector.py:111-127);
    padtype="odd" gives scipy's edge extension instead."""
    out = np.asarray(
        collector_filter_chain_batch(raw_tc[None].astype(np.float64), fs, padtype)
    )[0]
    out = np.round(out, decimals=7)
    out[out == 0.0] = 0.0  # normalize -0.0 (reference: collector :133-135)
    return out


def write_trial_csv(path, data_tc: np.ndarray) -> None:
    """Append a [T, C] window as '%.7f' comma-separated rows (reference:
    collector :136-139)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "a") as f:
        np.savetxt(f, data_tc, delimiter=",", fmt="%.7f")


def record_trial(
    board,
    label: str,
    out_dir,
    window_samples: int = 625,
    fs: Optional[float] = None,
) -> Optional[Path]:
    """Capture + filter + persist one labeled trial from a live board.
    Returns the written path, or None if the board had no data yet."""
    data = board.get_current_board_data(window_samples)
    if data.shape[1] < window_samples:
        return None
    eeg_tc = data[board.eeg_channels, :].T  # [T, C]
    fs = float(fs if fs is not None else board.get_sampling_rate(board.get_board_id()))
    filtered = preprocess_trial(eeg_tc, fs=fs)
    path = Path(out_dir) / f"{label}_{uuid.uuid4()}.csv"
    write_trial_csv(path, filtered)
    return path
