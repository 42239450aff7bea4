"""Analytic signal / instantaneous phase via FFT.

Parity target: `scipy.signal.hilbert(x, axis=0)` as used by the reference's
phase extraction (reference: MindsAI/mindsai_filter_python/core.py:14-16).
scipy builds the analytic signal by zeroing the negative-frequency half of
the spectrum and doubling the positive half:

  n even: h[0] = h[n/2] = 1,  h[1:n/2] = 2,      h[n/2+1:] = 0
  n odd:  h[0] = 1,           h[1:(n+1)/2] = 2,  h[(n+1)/2:] = 0

For the reference's T=625 (odd) that is h[0]=1, h[1:313]=2, h[313:]=0.
Implemented with jnp.fft so it jits, batches, and differentiates; the time
axis is the *last* axis here (TPU lane axis) — callers with [T, C] data
transpose, which XLA fuses into the FFT's own layout handling.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=32)
def _hilbert_gain(n: int) -> np.ndarray:
    h = np.zeros(n, dtype=np.float64)
    h[0] = 1.0
    if n % 2 == 0:
        h[1 : n // 2] = 2.0
        h[n // 2] = 1.0
    else:
        h[1 : (n + 1) // 2] = 2.0
    return h


def analytic_signal(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Complex analytic signal of real `x` along `axis` (scipy semantics)."""
    n = x.shape[axis]
    spec = jnp.fft.fft(x, axis=axis)
    gain = jnp.asarray(_hilbert_gain(n), dtype=spec.real.dtype)
    shape = [1] * x.ndim
    shape[axis] = n
    return jnp.fft.ifft(spec * gain.reshape(shape), axis=axis)


def instantaneous_phase(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """angle(hilbert(x)) along `axis` — the Kuramoto phase input."""
    z = analytic_signal(x, axis=axis)
    return jnp.arctan2(z.imag, z.real)


@functools.lru_cache(maxsize=8)
def _hilbert_transform_matrix(n: int) -> np.ndarray:
    """Dense Hilbert-transform operator H [n, n] with H @ x = imag(hilbert(x)).

    For real x the analytic signal is exactly x + i * H(x) (the real part of
    ifft(h * fft(x)) is x itself), so for fixed window lengths the whole
    Hilbert step is ONE matmul — on TPU this runs on the MXU in a fraction
    of the time of an odd-length (625 = 5^4) batched FFT. Built once in
    float64 via the FFT definition applied to the identity.
    """
    h = _hilbert_gain(n)
    a = np.fft.ifft(h[:, None] * np.fft.fft(np.eye(n), axis=0), axis=0)
    return np.ascontiguousarray(a.imag)


def analytic_signal_matmul(
    x_tc: jnp.ndarray, *, precision=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(real, imag) of the analytic signal over axis 0 of [T, C] via the
    dense Hilbert operator — the MXU fast path for fixed T. Matches
    analytic_signal(x, axis=0) to dtype precision."""
    import jax

    if precision is None:
        precision = jax.lax.Precision.HIGHEST
    t = x_tc.shape[0]
    h = jnp.asarray(_hilbert_transform_matrix(t), x_tc.dtype)
    im = jnp.matmul(h, x_tc, precision=precision)
    return x_tc, im
