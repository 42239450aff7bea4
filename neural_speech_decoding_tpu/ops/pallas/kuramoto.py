"""Pallas TPU kernel: fused Hilbert + Kuramoto pair-desynchrony grams.

The MAI filter's front half (reference: MindsAI/mindsai_filter_python/
core.py:14-26 — hilbert -> angle -> pairwise sin^2 sums) is, in the XLA
stages path (ops/kuramoto.py), three HBM round trips at serving batch:

  1. im = H @ x            reads x [B, T, C], writes im [B, T, C]
  2. c2/s2 + concat        reads (x, im), writes m [B, 2T, C]
  3. gram m^T m            reads m, batched [8, 2T] x [2T, 8] dots that
                           pad onto 128x128 MXU tiles (~16x lane waste)

measured 8.4 ms of the filter's 12.9 at B=16384 on a v5e (2026-08-18,
docs/BENCHMARKS.md "Measured negatives on the remaining filter
headroom"). This kernel fuses all three: the batch rides the lane axis
(layout [C, T, LANES] per block), the Hilbert operator H [T, T] stays
resident in VMEM across the whole grid (constant index_map), each
channel's imaginary part is ONE [T, T] x [T, LANES] MXU dot at HIGHEST
precision, c2/s2 are computed transcendental-free in VMEM
(kuramoto_operator_from_parts' identity), and the C(C+1)/2 = 36 pair
sums are full-tile VPU multiply-reduces. One HBM read of x, one [36, B]
write — the analytic signal and the [2T, C] concat never exist in HBM.

Wrapper contract: `kuramoto_pair_sums(windows_btc)` -> [B, C, C]
symmetric gram sums G[i, j] = sum_t (c2_i c2_j + s2_i s2_j), the exact
quantity `_operator_from_cs` derives P from (P = (T - G) / 2, zero
diag). Off-TPU callers pass interpret=True (tests) or use the XLA
stages path in ops/kuramoto.py.

Not differentiable (no VJP): the filter is serving/preprocessing only —
training applies it as a host-side precompute (train/loop.py) and never
differentiates through it.

Accumulation precision: each pair sum is a plain f32 jnp.sum over T=625
terms of O(1) products — expected error ~sqrt(T)*ulp ~ 1e-5 relative,
measured 4.2e-5 end-to-end dlogit on chip vs the <=1e-4 budget
(checkpoints/fidelity_r4_filter.json). The stages path's HIGHEST-dot
gram is tighter (exact bf16-split partial products), so the kernel has
less headroom and the residual grows ~sqrt(T): if T ever grows by more
than ~4x, switch the pair reduce to a compensated (TwoSum) accumulation
before trusting the budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from neural_speech_decoding_tpu.ops.hilbert import _hilbert_transform_matrix

# Batch block on lanes. VMEM at T=625, C=8: x block 2.56 MB (+ double
# buffer), H 1.56 MB (resident, constant index), c2/s2 16 x 320 KB =
# 5.1 MB, im/p2 temps ~1 MB -> ~13 MB peak, inside the 16 MB budget.
_LANES = 128


def _pair_sums_kernel(t: int, c: int):
    npairs = c * (c + 1) // 2
    tiny = float(np.finfo(np.float32).tiny)

    def kernel(h_ref, x_ref, out_ref):
        # h_ref [T, T]; x_ref [C, T, LANES]; out_ref [npairs, LANES]
        c2s, s2s = [], []
        for ci in range(c):
            xc = x_ref[ci]  # [T, LANES] full tiles
            im = jax.lax.dot_general(
                h_ref[...],
                xc,
                dimension_numbers=(((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )
            # Transcendental-free c2 = cos 2phi, s2 = sin 2phi from the
            # analytic signal (re = x itself for a real signal) — same
            # math and same degenerate guard as
            # kuramoto_operator_from_parts (ops/kuramoto.py).
            re2 = xc * xc
            im2 = im * im
            p2 = re2 + im2
            degenerate = p2 < tiny
            inv = 1.0 / jnp.where(degenerate, 1.0, p2)
            c2s.append(jnp.where(degenerate, 1.0, (re2 - im2) * inv))
            s2s.append(jnp.where(degenerate, 0.0, (2.0 * xc * im) * inv))
        rows = []
        for ci in range(c):
            for di in range(ci, c):
                prod = c2s[ci] * c2s[di] + s2s[ci] * s2s[di]
                rows.append(jnp.sum(prod, axis=0, keepdims=True))
        out_ref[...] = jnp.concatenate(rows, axis=0)

    return kernel


@functools.partial(jax.jit, static_argnames=("c", "interpret"))
def _pair_sums_batched(
    h_tt: jnp.ndarray,
    x_ctb: jnp.ndarray,
    c: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """H [T, T], x [C, T, M] -> pair sums [npairs, M]; M % _LANES == 0."""
    _, t, m = x_ctb.shape
    npairs = c * (c + 1) // 2
    return pl.pallas_call(
        _pair_sums_kernel(t, c),
        out_shape=jax.ShapeDtypeStruct((npairs, m), jnp.float32),
        grid=(m // _LANES,),
        in_specs=[
            pl.BlockSpec((t, t), lambda i: (0, 0)),  # H resident
            pl.BlockSpec((c, t, _LANES), lambda i: (0, 0, i)),
        ],
        out_specs=pl.BlockSpec((npairs, _LANES), lambda i: (0, i)),
        interpret=interpret,
    )(h_tt, x_ctb)


def kuramoto_pair_sums(
    windows_btc: jnp.ndarray, *, interpret: bool = False
) -> jnp.ndarray:
    """[B, T, C] raw windows -> [B, C, C] symmetric Kuramoto gram sums
    G[i, j] = sum_t (cos 2phi_i cos 2phi_j + sin 2phi_i sin 2phi_j),
    phases from the dense-matmul analytic signal (f32, HIGHEST)."""
    b, t, c = windows_btc.shape
    h = jnp.asarray(_hilbert_transform_matrix(t), jnp.float32)

    m_pad = ((b + _LANES - 1) // _LANES) * _LANES
    x = jnp.moveaxis(windows_btc.astype(jnp.float32), 0, -1)  # [T, C, B]
    x = jnp.swapaxes(x, 0, 1)  # [C, T, B]
    if m_pad != b:
        # zero-pad batch: an all-zero window is the degenerate case the
        # kernel guards (c2 = 1, s2 = 0), and its rows are sliced away
        x = jnp.concatenate([x, jnp.zeros((c, t, m_pad - b), x.dtype)], -1)
    out = _pair_sums_batched(h, x, c, interpret=interpret)  # [P, m_pad]
    out = jnp.moveaxis(out[:, :b], -1, 0)  # [B, P]

    iu, ju = np.triu_indices(c)
    full = jnp.zeros((b, c, c), jnp.float32)
    full = full.at[:, iu, ju].set(out)
    full = full.at[:, ju, iu].set(out)  # mirror (diag rewrites same value)
    return full
