"""Pallas TPU kernel: batched SPD matrix-log via Chebyshev Clenshaw.

The logcov family's serving bottleneck is logm of [B*nb, 8, 8] SPD
covariances. XLA's eigh unrolls a generic Jacobi solver (~11k windows/s on
chip), and the pure-XLA Chebyshev scan is no better because a batched
8x8 matmul pads each operand into 128x128 MXU tiles (~16x waste) and
round-trips HBM every one of the ~256 recurrence steps.

This kernel flips the layout: matrices are stored as [64, M] — the 8x8
entries unrolled onto sublanes, the BATCH on lanes — so one Clenshaw step
  b0 = c_k I + 2 t b1 - b2
is 512 vector FMAs, each across a full lane-tile of windows, and the whole
recurrence (b1, b2 carries) lives in VMEM for the block. One HBM read of t
and one write of the result per block, regardless of polynomial degree.

The wrapper handles trace pre-normalization, the affine map onto the
Chebyshev domain, and the log(trace/C) diagonal correction (all cheap
elementwise XLA); models/logcov.py chooses this path on TPU and the XLA
scan elsewhere. Measured on chip (real trials, vs CPU f64 eigh ground
truth): this kernel 4.2e-3 max feature error at ~101k windows/s — both
MORE ACCURATE and ~9.5x faster than the TPU f32 eigh path (2.8e-2 at
~11k windows/s). Kernel-only error vs an f64 Clenshaw reference: 3.6e-6
(tests/test_pallas_logm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512  # batch block on the lane axis (4 * 128)


def _clenshaw_kernel(c: int, degree: int):
    """Kernel body for C x C matrices (C*C sublane rows per block)."""

    def kernel(coeffs_ref, t_ref, out_ref):
        t = t_ref[:].reshape(c, c, _LANES)
        # identity built from iota comparisons — a full (non-replicated)
        # constant; broadcasting jnp.eye's [c, c, 1] trips Mosaic relayout
        row = jax.lax.broadcasted_iota(jnp.int32, (c, c, _LANES), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (c, c, _LANES), 1)
        eye = (row == col).astype(t.dtype)

        def matmul(a, b):
            # per-window C x C matmul, batch on lanes:
            # out[i, k, m] = sum_j a[i, j, m] * b[j, k, m]
            acc = a[:, 0:1, :] * b[0:1, :, :]
            for j in range(1, c):
                acc = acc + a[:, j : j + 1, :] * b[j : j + 1, :, :]
            return acc

        def step(i, carry):
            b1, b2 = carry
            ck = coeffs_ref[degree - i]  # k runs degree .. 1
            b0 = ck * eye + 2.0 * matmul(t, b1) - b2
            return (b0, b1)

        # 0*t (not zeros_like): the carry must share t's concrete vector
        # layout — a literal zero constant is lane/sublane-replicated and
        # Mosaic refuses the relayout into it on the backedge
        zero = t * 0.0
        b1, b2 = jax.lax.fori_loop(0, degree, step, (zero, zero * 1.0))
        out = coeffs_ref[0] * eye + matmul(t, b1) - b2
        out_ref[:] = out.reshape(c * c, _LANES)

    return kernel


@functools.partial(jax.jit, static_argnames=("degree", "interpret"))
def _clenshaw_batched(
    t_64m: jnp.ndarray, coeffs: jnp.ndarray, degree: int,
    interpret: bool = False,
):
    """[C*C, M] Clenshaw over lane blocks; M must be a multiple of _LANES."""
    rows, m = t_64m.shape
    c = int(np.sqrt(rows))
    grid = (m // _LANES,)
    return pl.pallas_call(
        _clenshaw_kernel(c, degree),
        out_shape=jax.ShapeDtypeStruct((rows, m), t_64m.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coeffs, read per step
            pl.BlockSpec((rows, _LANES), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda i: (0, i)),
        interpret=interpret,
    )(coeffs, t_64m)


def _logm_clenshaw_xla(s, coeffs_tuple, lo: float, hi: float):
    """Differentiable XLA Clenshaw evaluating the SAME polynomial as the
    kernel — the custom-VJP backward recomputes through this, so grads of
    the served function are exact (it is the polynomial that is served,
    not the true logm). Mirrors models/logcov._logm_spd_chebyshev."""
    c = s.shape[-1]
    coeffs = jnp.asarray(coeffs_tuple, dtype=s.dtype)
    eye = jnp.eye(c, dtype=s.dtype)
    trace = jnp.trace(s, axis1=-2, axis2=-1)[..., None, None] / c
    a = s / trace
    t = (2.0 * a - (hi + lo) * eye) / (hi - lo)
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def step(carry, ck):
        b1, b2 = carry
        return (ck * eye + 2.0 * mm(t, b1) - b2, b1), None

    zero = jnp.zeros_like(t)
    (b1, b2), _ = jax.lax.scan(step, (zero, zero), coeffs[1:][::-1])
    return coeffs[0] * eye + mm(t, b1) - b2 + jnp.log(trace) * eye


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _logm_pallas_diff(s, coeffs_tuple, lo, hi, interpret):
    return _logm_pallas_impl(s, coeffs_tuple, lo, hi, interpret=interpret)


def _logm_pallas_fwd(s, coeffs_tuple, lo, hi, interpret):
    return _logm_pallas_diff(s, coeffs_tuple, lo, hi, interpret), s


def _logm_pallas_bwd(coeffs_tuple, lo, hi, interpret, s, ct):
    # pallas_call has no transpose rule; recompute the VJP through the
    # XLA scan (identical polynomial) — training batches are small, and
    # the forward stays on the fast kernel
    _, vjp = jax.vjp(lambda x: _logm_clenshaw_xla(x, coeffs_tuple, lo, hi), s)
    return vjp(ct)


_logm_pallas_diff.defvjp(_logm_pallas_fwd, _logm_pallas_bwd)


def logm_spd_chebyshev_pallas(
    s: jnp.ndarray, coeffs_tuple, lo: float, hi: float,
    *, interpret: bool = False,
) -> jnp.ndarray:
    """logm of [..., C, C] SPD matrices (trace-normalized Chebyshev fit of
    log on [lo, hi]); same contract as the XLA scan in models/logcov.py.
    Differentiable: the backward pass recomputes through the XLA Clenshaw
    (`_logm_clenshaw_xla`), so full-window logcov training works on TPU."""
    return _logm_pallas_diff(s, tuple(coeffs_tuple), lo, hi, interpret)


def _logm_pallas_impl(
    s: jnp.ndarray, coeffs_tuple, lo: float, hi: float,
    *, interpret: bool = False,
) -> jnp.ndarray:
    *batch, c, _ = s.shape
    s2 = s.reshape(-1, c, c).astype(jnp.float32)
    m = s2.shape[0]
    eye = jnp.eye(c, dtype=s2.dtype)
    trace = jnp.trace(s2, axis1=-2, axis2=-1)[:, None, None] / c
    a = s2 / trace
    t = (2.0 * a - (hi + lo) * eye) / (hi - lo)

    # [M, C, C] -> [C*C, M] (batch on lanes), padded to the lane block
    t_rows = jnp.moveaxis(t, 0, -1).reshape(c * c, m)
    m_pad = ((m + _LANES - 1) // _LANES) * _LANES
    if m_pad != m:
        # pad with the identity's Chebyshev image (any in-domain matrix
        # works; padding lanes are discarded)
        pad_t = jnp.broadcast_to(
            ((2.0 - (hi + lo)) / (hi - lo) * eye).reshape(c * c, 1),
            (c * c, m_pad - m),
        )
        t_rows = jnp.concatenate([t_rows, pad_t], axis=1)

    coeffs = jnp.asarray(coeffs_tuple, dtype=jnp.float32)
    out_rows = _clenshaw_batched(
        t_rows, coeffs, len(coeffs_tuple) - 1, interpret=interpret
    )

    out = jnp.moveaxis(out_rows[:, :m].reshape(c, c, m), -1, 0)
    out = out + jnp.log(trace) * eye
    return out.reshape(*batch, c, c)
