"""IIR filtering: Butterworth design + zero-phase biquad cascades in JAX.

The reference's collection pipeline filters every channel with BrainFlow's
C++ DSP before saving trials (reference: Neural_decoding_data_collector.py:
111-127): constant detrend, bandstop 39.5-40.5 Hz (order 4), bandpass
3-48 Hz (order 2), bandstop 49.5-50.5 Hz (order 4), bandstop 59-61 Hz
(order 4), all BUTTERWORTH_ZERO_PHASE. This module is the TPU-native
equivalent: coefficients are designed host-side (scipy, at trace time,
cached), the cascade runs as ONE `lax.scan` over time carrying all biquad
states for all channels simultaneously — no Python loop over samples or
channels — and zero-phase filtering is a forward pass + a reversed pass.

Shapes are time-major [T, C]; everything vmaps over a leading batch axis.
Padding: `padtype="odd"` reproduces scipy.signal.sosfiltfilt's default
odd-extension; `padtype=None` is the pad-free forward-backward pass
(BrainFlow's behavior).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Design (host-side, cached; scipy only at trace time)
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=64)
def butter_sos(
    kind: str, order: int, lo: float, hi: float, fs: float
) -> Tuple[Tuple[float, ...], ...]:
    """Butterworth second-order sections. kind: bandpass|bandstop|lowpass|highpass.

    scipy semantics: for band filters the resulting filter order is
    2*order. Returned as a hashable tuple-of-tuples [S, 6].
    """
    from scipy.signal import butter

    if kind in ("bandpass", "bandstop"):
        wn = (lo, hi)
    elif kind == "lowpass":
        wn = hi
    elif kind == "highpass":
        wn = lo
    else:
        raise ValueError(f"unknown filter kind {kind!r}")
    sos = butter(order, wn, btype=kind, fs=fs, output="sos")
    return tuple(tuple(float(v) for v in row) for row in sos)


def _sos_array(sos) -> np.ndarray:
    arr = np.asarray(sos, dtype=np.float64)
    if arr.ndim != 2 or arr.shape[1] != 6:
        raise ValueError(f"sos must be [S, 6], got {arr.shape}")
    return arr


# ---------------------------------------------------------------------------
# Cascade execution
# ---------------------------------------------------------------------------
def sosfilt_zi(sos) -> np.ndarray:
    """Steady-state (unit-step) initial biquad states, like
    scipy.signal.sosfilt_zi: [S, 2], with each section's state scaled by
    the cumulative DC gain of the sections before it."""
    sos = _sos_array(sos)
    zi = np.zeros((sos.shape[0], 2))
    scale = 1.0
    for s, (b0, b1, b2, _a0, a1, a2) in enumerate(sos):
        g = (b0 + b1 + b2) / (1.0 + a1 + a2)  # section DC gain
        z2 = b2 - a2 * g
        z1 = (b1 - a1 * g) + z2
        zi[s] = (scale * z1, scale * z2)
        scale *= g
    return zi


def sosfilt(sos, x_tc: jnp.ndarray, zi: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Causal biquad cascade along axis 0 of [T, C] (direct form II
    transposed, like scipy.signal.sosfilt). `zi`: optional initial states
    [S, 2, C]."""
    sos = _sos_array(sos)
    n_sections = sos.shape[0]
    dtype = x_tc.dtype
    coeff = jnp.asarray(sos, dtype)
    c = x_tc.shape[1]

    def step(z, x_t):
        # z: [S, 2, C] biquad states; x_t: [C]
        new_z = []
        y = x_t
        for s in range(n_sections):  # static unroll: S is 1-4
            b0, b1, b2, _a0, a1, a2 = [coeff[s, i] for i in range(6)]
            z1, z2 = z[s, 0], z[s, 1]
            out = b0 * y + z1
            z1n = b1 * y - a1 * out + z2
            z2n = b2 * y - a2 * out
            new_z.append(jnp.stack([z1n, z2n]))
            y = out
        return jnp.stack(new_z), y

    z0 = jnp.zeros((n_sections, 2, c), dtype) if zi is None else zi.astype(dtype)
    _, y = jax.lax.scan(step, z0, x_tc)
    return y


def _odd_ext(x_tc: jnp.ndarray, n: int) -> jnp.ndarray:
    """Odd extension at both ends along axis 0 (scipy.signal._arraytools)."""
    left = 2 * x_tc[0] - x_tc[n:0:-1]
    right = 2 * x_tc[-1] - x_tc[-2 : -(n + 2) : -1]
    return jnp.concatenate([left, x_tc, right], axis=0)


def default_padlen(sos) -> int:
    """scipy.signal.sosfiltfilt's default padlen: 3 * (2*S + 1 - min(#
    sections with b2 == 0, # sections with a2 == 0))."""
    sos = _sos_array(sos)
    ntaps = 2 * sos.shape[0] + 1
    ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
    return 3 * int(ntaps)


def sosfiltfilt(
    sos,
    x_tc: jnp.ndarray,
    padtype: Optional[str] = "odd",
    padlen: Optional[int] = None,
) -> jnp.ndarray:
    """Zero-phase filtering: forward pass, then reversed pass.

    padtype="odd" matches scipy.signal.sosfiltfilt with its default
    padlen; padtype=None applies no edge extension (BrainFlow-style).
    """
    if padtype is None:
        y = sosfilt(sos, x_tc)
        return sosfilt(sos, y[::-1])[::-1]
    if padtype != "odd":
        raise ValueError("padtype must be 'odd' or None")
    n = default_padlen(sos) if padlen is None else int(padlen)
    if n >= x_tc.shape[0]:
        raise ValueError(
            f"padlen {n} >= signal length {x_tc.shape[0]}"
        )
    ext = _odd_ext(x_tc, n)
    # scipy scales steady-state initial conditions by the edge samples
    zi = jnp.asarray(sosfilt_zi(sos), ext.dtype)[:, :, None]
    y = sosfilt(sos, ext, zi=zi * ext[0][None, None, :])
    y = y[::-1]
    y = sosfilt(sos, y, zi=zi * y[0][None, None, :])[::-1]
    return y[n : n + x_tc.shape[0]]


def detrend_constant(x_tc: jnp.ndarray) -> jnp.ndarray:
    """Remove the per-channel mean (BrainFlow DetrendOperations.CONSTANT)."""
    return x_tc - jnp.mean(x_tc, axis=0, keepdims=True)


# ---------------------------------------------------------------------------
# The collector chain
# ---------------------------------------------------------------------------
def collector_filter_chain(
    x_tc: jnp.ndarray, fs: float = 125.0, padtype: Optional[str] = "odd"
) -> jnp.ndarray:
    """The reference collection-time preprocessing for one [T, C] window
    (reference: Neural_decoding_data_collector.py:111-127)."""
    stages = (
        ("bandstop", 4, 39.5, 40.5),
        ("bandpass", 2, 3.0, 48.0),
        ("bandstop", 4, 49.5, 50.5),
        ("bandstop", 4, 59.0, 61.0),
    )
    y = detrend_constant(x_tc.astype(jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32))
    for kind, order, lo, hi in stages:
        y = sosfiltfilt(butter_sos(kind, order, lo, hi, float(fs)), y, padtype=padtype)
    return y


@functools.partial(jax.jit, static_argnames=("fs", "padtype"))
def collector_filter_chain_batch(
    x_btc: jnp.ndarray, fs: float = 125.0, padtype: Optional[str] = "odd"
) -> jnp.ndarray:
    return jax.vmap(lambda w: collector_filter_chain(w, fs, padtype))(x_btc)
