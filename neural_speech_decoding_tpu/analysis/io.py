"""Robust signal-file intake for analysis tooling.

Parity with the reference offline tool's intake behavior (reference:
MindsAI/examples/Minds_AI_Filter_Offline_Signal_Analysis.py:63-258):
numeric CSV reading that tolerates headers/index columns and either
delimiter, orientation auto-detection ([C, T] vs [T, C]), unit
auto-detection (volts/millivolts/microvolts -> microvolts), and optional
EDF reading (gated on pyedflib, absent in this image).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def read_numeric_csv(path) -> np.ndarray:
    """Read a CSV of numbers into a 2D float64 array. Tolerates a header
    row, an index column, and ',' or whitespace delimiters."""
    path = Path(path)
    text = path.read_text()
    delim = "," if "," in text.splitlines()[0] or "," in text else None

    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split(",") if delim else line.split()
        vals = []
        ok = True
        for p in parts:
            p = p.strip()
            if not p:
                continue
            try:
                vals.append(float(p))
            except ValueError:
                ok = False
                break
        if ok and vals:
            rows.append(vals)
    if not rows:
        raise ValueError(f"{path.name}: no numeric rows found")
    width = max(len(r) for r in rows)
    rows = [r for r in rows if len(r) == width]
    arr = np.asarray(rows, dtype=np.float64)
    # drop a leading index column (strictly increasing integers)
    if arr.shape[1] > 2:
        col0 = arr[:, 0]
        if np.all(np.diff(col0) > 0) and np.allclose(col0, np.round(col0)):
            arr = arr[:, 1:]
    return arr


def detect_orientation(arr: np.ndarray, max_channels: int = 64) -> np.ndarray:
    """Return data as [C, T]: EEG recordings always have far more samples
    than channels, so the short axis is channels."""
    if arr.ndim != 2:
        raise ValueError(f"expected 2D, got {arr.shape}")
    r, c = arr.shape
    if r <= max_channels < c:
        return arr
    if c <= max_channels < r:
        return arr.T
    # both small or both large: shorter axis = channels
    return arr if r <= c else arr.T


def detect_unit_scale(arr: np.ndarray) -> Tuple[float, str]:
    """Guess the unit from magnitudes and return (scale_to_uV, name).
    EEG is ~0.1-200 uV: values ~1e-5 are volts, ~1e-2 millivolts,
    ~1-100 microvolts, ~1e3+ nanovolts."""
    mag = float(np.median(np.abs(arr[arr != 0]))) if np.any(arr != 0) else 0.0
    if mag == 0.0:
        return 1.0, "microvolts"
    if mag < 1e-3:
        return 1e6, "volts"
    if mag < 1.0:
        return 1e3, "millivolts"
    if mag > 5e3:
        return 1e-3, "nanovolts"
    return 1.0, "microvolts"


def read_edf_numeric(path) -> Tuple[np.ndarray, Optional[float]]:
    """Read an EDF file into ([C, T], fs). Requires pyedflib."""
    try:
        import pyedflib  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "EDF intake requires pyedflib, which is not installed in this "
            "environment; convert to CSV or install pyedflib"
        ) from e
    f = pyedflib.EdfReader(str(path))  # pragma: no cover - gated on dep
    try:
        n = f.signals_in_file
        sigs = [f.readSignal(i) for i in range(n)]
        fs = float(f.getSampleFrequency(0)) if n else None
        t = min(len(s) for s in sigs)
        return np.stack([s[:t] for s in sigs]), fs
    finally:
        f.close()
