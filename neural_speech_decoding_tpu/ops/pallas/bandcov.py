"""Pallas TPU kernel: per-band spatial grams, batch on lanes.

The logcov front-end needs, per window and per band, the C x C gram of
that band's projected rows: S_k[c, d] = sum_{r in band k} y[r, c] y[r, d].
As XLA einsums these are [8 x bins] @ [bins x 8] batched matmuls — each
padded onto 128x128 MXU tiles (~16x waste both sides) — measured ~35 ms
of the flagship's ~110 ms budget at B=16384.

This kernel flips the layout exactly like ops/pallas/logm.py: the BATCH
rides the lane axis. A block holds y as [C, R, LANES]; each of the
C(C+1)/2 channel pairs is ONE full-tile elementwise product
[R, LANES] followed by static-slice row sums per band — all VPU work on
dense (8, 128) tiles, no MXU padding, one HBM read of y and one write of
the [nb * P, LANES] result per block.

Wrapper contract: `band_grams(y_brc, slices, nb)` -> [B, nb, C, C]
symmetric gram sums (unscaled — callers apply 2/T^2 and shrinkage).
Off-TPU callers pass interpret=True (tests) or use the XLA einsum path
in models/logcov.py.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LANES = 256  # batch block on lanes (VMEM: y block C*R*LANES*4B ~ 3.7 MB)


def _gram_kernel(c: int, r: int, slices: Tuple[Tuple[int, int], ...]):
    nb = len(slices)
    npairs = c * (c + 1) // 2

    def kernel(y_ref, out_ref):
        # y_ref [C, R, LANES]; out_ref [nb * npairs, LANES], row layout
        # k * npairs + p so one band's pair-vector is contiguous
        rows = [None] * (nb * npairs)
        p = 0
        for ci in range(c):
            for di in range(ci, c):
                prod = y_ref[ci] * y_ref[di]  # [R, LANES] full tiles
                for k, (lo, hi) in enumerate(slices):
                    rows[k * npairs + p] = jnp.sum(
                        prod[lo:hi], axis=0, keepdims=True
                    )
                p += 1
        out_ref[:] = jnp.concatenate(rows, axis=0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("slices", "c", "interpret")
)
def _grams_batched(
    y_crb: jnp.ndarray,
    slices: Tuple[Tuple[int, int], ...],
    c: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """[C, R, M] -> [nb * P, M]; M must be a multiple of _LANES."""
    _, r, m = y_crb.shape
    nb, npairs = len(slices), c * (c + 1) // 2
    return pl.pallas_call(
        _gram_kernel(c, r, slices),
        out_shape=jax.ShapeDtypeStruct((nb * npairs, m), y_crb.dtype),
        grid=(m // _LANES,),
        in_specs=[pl.BlockSpec((c, r, _LANES), lambda i: (0, 0, i))],
        out_specs=pl.BlockSpec((nb * npairs, _LANES), lambda i: (0, i)),
        interpret=interpret,
    )(y_crb)


def _band_grams_xla(y_brc, sl: Tuple[Tuple[int, int], ...]):
    """Differentiable einsum reference computing the same grams — the
    custom-VJP backward recomputes through this (pallas_call has no
    transpose rule; full-window whitened-logcov training needs grads)."""
    hp = jax.lax.Precision.HIGHEST
    return jnp.stack(
        [
            jnp.einsum(
                "brc,brd->bcd", y_brc[:, lo:hi], y_brc[:, lo:hi],
                precision=hp,
            )
            for lo, hi in sl
        ],
        axis=1,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _band_grams_diff(y_brc, sl, interpret):
    return _band_grams_impl(y_brc, sl, interpret)


def _band_grams_fwd(y_brc, sl, interpret):
    return _band_grams_diff(y_brc, sl, interpret), y_brc


def _band_grams_bwd(sl, interpret, y_brc, ct):
    _, vjp = jax.vjp(lambda y: _band_grams_xla(y, sl), y_brc)
    return vjp(ct)


_band_grams_diff.defvjp(_band_grams_fwd, _band_grams_bwd)


def band_grams(
    y_brc: jnp.ndarray,
    slices: Sequence[slice],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, R, C] projected rows -> [B, nb, C, C] per-band gram sums
    (exactly symmetric; unscaled). Differentiable: backward recomputes
    through the einsum reference (`_band_grams_xla`)."""
    sl = tuple((s.start, s.stop) for s in slices)
    return _band_grams_diff(y_brc, sl, interpret)


def _band_grams_impl(
    y_brc: jnp.ndarray,
    sl: Tuple[Tuple[int, int], ...],
    interpret: bool = False,
) -> jnp.ndarray:
    b, r, c = y_brc.shape
    nb = len(sl)
    npairs = c * (c + 1) // 2

    m_pad = ((b + _LANES - 1) // _LANES) * _LANES
    y = jnp.moveaxis(y_brc, 0, -1)  # [R, C, B] -> want [C, R, B]
    y = jnp.swapaxes(y, 0, 1)  # [C, R, B]
    if m_pad != b:
        y = jnp.concatenate(
            [y, jnp.zeros((c, r, m_pad - b), y.dtype)], axis=-1
        )
    out = _grams_batched(y, sl, c, interpret=interpret)  # [nb*P, m_pad]
    out = out[:, :b].reshape(nb, npairs, b)
    out = jnp.moveaxis(out, -1, 0)  # [B, nb, P]

    iu, ju = np.triu_indices(c)
    full = jnp.zeros((b, nb, c, c), y_brc.dtype)
    full = full.at[..., iu, ju].set(out)
    full = full.at[..., ju, iu].set(out)  # mirror (diag rewrites same value)
    return full
