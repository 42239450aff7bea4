"""Kuramoto-phase spatial filter ("MAI filter"), TPU-first.

Behavioral spec (reference: MindsAI/mindsai_filter_python/core.py:9-51, used
through Utilities/preprocessor.py:21-36):

  1. phases = angle(hilbert(x)) over time, per channel          [T, C]
  2. pairwise desynchrony  P[i,j] = sum_t sin^2(phi_i - phi_j)  [C, C],
     symmetric, diagonal exactly zero
  3. "diag" renorm: d = sqrt(clip(diag(P), 1e-12)); P /= outer(d, d)
     (since diag(P) == 0, this multiplies every entry by 1e12 — a reference
     quirk we reproduce exactly, see SURVEY.md §7 "fidelity traps")
  4. closed-form ridge:  out = (I + lambda * P^T P)^{-1} @ y    (y = [C, T])

The reference computes step 2 with an O(C^2 T) Python pair loop in float64.
Here it is a pair of [C, T] x [T, C] matmuls via the identity

  sin^2(a - b) = (1 - cos(2a - 2b)) / 2
              = (1 - cos 2a * cos 2b - sin 2a * sin 2b) / 2
  => P = (T - C2^T C2 - S2^T S2) / 2,   C2 = cos(2*phases), S2 = sin(2*phases)

which maps straight onto the MXU, batches with vmap, and has no
data-dependent control flow. The diagonal is forced to exactly 0 to match
the reference's never-written diagonal.

Precision: the reference runs in float64. `precision="highest"` keeps the
operator algebra in the widest dtype the backend provides (f64 on CPU with
x64 enabled; f32 on TPU) and uses HIGHEST matmul precision so the TPU MXU
does not downcast to bf16. `precision="fast"` is the throughput path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops.hilbert import instantaneous_phase


def _wide_dtype(precision: str) -> jnp.dtype:
    if precision == "highest" and jax.config.read("jax_enable_x64"):
        return jnp.float64
    return jnp.float32


def kuramoto_operator(
    phases_tc: jnp.ndarray, *, matmul_precision=jax.lax.Precision.HIGHEST
) -> jnp.ndarray:
    """Pairwise-desynchrony operator from phases [T, C] -> P [C, C]."""
    t = phases_tc.shape[0]
    c2 = jnp.cos(2.0 * phases_tc)
    s2 = jnp.sin(2.0 * phases_tc)
    gram = jnp.matmul(c2.T, c2, precision=matmul_precision) + jnp.matmul(
        s2.T, s2, precision=matmul_precision
    )
    p = 0.5 * (jnp.asarray(t, phases_tc.dtype) - gram)
    # The reference never writes the diagonal (pair loop skips i == j);
    # force it to exactly 0 so the renorm sees the same clip-to-eps input.
    return p - jnp.diag(jnp.diag(p))


def _renorm_diag(p: jnp.ndarray, eps: float) -> jnp.ndarray:
    d = jnp.sqrt(jnp.clip(jnp.diag(p), eps, None))
    return p / jnp.outer(d, d)


def mai_filter(
    x_tc: jnp.ndarray,
    config: Optional[FilterConfig] = None,
    *,
    lambd: Optional[float] = None,
) -> jnp.ndarray:
    """Apply the Kuramoto spatial filter to one window.

    Input/output are [T, C] (time-major, like the model), unlike the
    reference filter core which works on [C, T]; the orientation shuffle the
    reference does in preprocessor.py:31-34 is folded in here.
    """
    config = config or FilterConfig()
    if lambd is None:
        lambd = config.lambd
    dtype = _wide_dtype(config.precision)
    mm = (
        jax.lax.Precision.HIGHEST
        if config.precision == "highest"
        else jax.lax.Precision.DEFAULT
    )

    x = x_tc.astype(dtype)
    # FFT straight over the time axis — no transposes around the FFT; the
    # transposed formulation trips XLA:CPU's fft thunk layout check under
    # SPMD partitioning, and XLA handles the axis permutation internally.
    phases = instantaneous_phase(x, axis=0)
    p = kuramoto_operator(phases, matmul_precision=mm)
    if config.renorm == "diag":
        p = _renorm_diag(p, config.eps)

    c = x.shape[-1]
    eye = jnp.eye(c, dtype=dtype)
    a = eye + jnp.asarray(lambd, dtype) * jnp.matmul(p.T, p, precision=mm)
    # Solve A @ out^T = x^T  (reference inverts A explicitly; an LU solve on
    # the CxC system is better conditioned and equivalent at f64).
    out = jnp.linalg.solve(a, x.T).T
    return out.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config",))
def mai_filter_batch(
    windows_btc: jnp.ndarray, config: Optional[FilterConfig] = None
) -> jnp.ndarray:
    """vmapped filter over a batch of windows [B, T, C] -> [B, T, C] f32."""
    config = config or FilterConfig()
    return jax.vmap(lambda w: mai_filter(w, config))(windows_btc)
