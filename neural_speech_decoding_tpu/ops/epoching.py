"""Device-side epoching: frame continuous recordings into fixed windows.

The reference only ever decodes one live 5 s window at a time; bulk decode
of a recorded session means epoching a long [T_total, C] signal into
(possibly overlapping) fixed windows. Done on device as one gather so the
windows feed the batched pipeline without host-side copies (BASELINE.json
north star: "epoching into fixed windows" inside the fused preprocessing).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def num_frames(total: int, window: int, hop: int) -> int:
    if total < window:
        return 0
    return (total - window) // hop + 1


def frame_signal(
    signal_tc: jnp.ndarray, window: int, hop: int
) -> jnp.ndarray:
    """[T_total, C] -> [N, window, C] with N = (T_total - window)//hop + 1.

    Jittable (static window/hop/shapes); one gather, no data-dependent
    control flow.
    """
    total = signal_tc.shape[0]
    n = num_frames(total, window, hop)
    if n <= 0:
        raise ValueError(
            f"signal length {total} shorter than window {window}"
        )
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(window)[None, :]  # [N, window]
    return jnp.take(signal_tc, idx, axis=0)


def frame_times(
    total: int, window: int, hop: int, sample_rate: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(start_seconds, end_seconds) of each frame."""
    n = num_frames(total, window, hop)
    starts = jnp.arange(n) * hop / sample_rate
    return starts, starts + window / sample_rate
