"""Device mesh construction.

The reference has no multi-device execution at all (SURVEY.md §2.2) — its
concurrency is two OS processes and a Queue. The TPU rebuild scales the
other way: one program, many chips, `jax.sharding.Mesh` + NamedSharding,
XLA inserts the collectives. Axes:

  dp  data parallel over windows (the throughput axis — EEG decoding is
      embarrassingly parallel over windows)
  tp  tensor parallel over hidden/gate dimensions (exercised by the larger
      model families and the multi-chip dry run; pointless for the 31k-param
      LSTM in production, but the machinery is generic)
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_axes(n_devices: int, tp: Optional[int] = None) -> Tuple[int, int]:
    """Pick (dp, tp) for n devices: tp=2 when even and >1, else 1, unless
    given explicitly."""
    if tp is None:
        tp = 2 if (n_devices % 2 == 0 and n_devices > 1) else 1
    if n_devices % tp != 0:
        raise ValueError(f"tp={tp} does not divide {n_devices} devices")
    return n_devices // tp, tp


def make_mesh(
    devices: Optional[Sequence] = None,
    tp: Optional[int] = None,
    axis_names: Tuple[str, str] = ("dp", "tp"),
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp, tp_ = mesh_axes(len(devices), tp)
    grid = np.array(devices).reshape(dp, tp_)
    return Mesh(grid, axis_names)
