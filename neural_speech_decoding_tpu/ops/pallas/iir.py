"""Pallas TPU kernel: fused zero-phase IIR preprocessing.

The collector chain (ops/iir.collector_filter_chain) runs 4 Butterworth
stages zero-phase = 8 separate `lax.scan`s over time, each a full HBM
round-trip at batch scale. This kernel fuses ALL stages' biquads (10
second-order sections for the production chain) into a single pass per
direction: one forward kernel, one time-reversed kernel, so the whole
chain costs 2 HBM round-trips instead of 8+.

Semantics note: this applies the *combined* cascade forward then backward
(transfer |H1 H2 H3 H4|^2), while scipy/ops.iir apply each stage
forward+backward in sequence. In exact arithmetic the responses are
identical; on finite windows the edge transients differ slightly — this is
the production variant for bulk (re)preprocessing, validated against the
equivalent scipy composite; use ops/iir for scipy-exact per-stage behavior.

Layout: [T, N/128, 128] time-major — N = batch*channels padded to a
multiple of 128 so the last two block dims are a clean (sublane, lane)
tile and the time axis stays a *leading* dimension (T=625 has no
multiple-of-8 divisor, so it must not land on the sublane axis). Biquad
states persist in VMEM scratch across time chunks; the backward kernel
walks chunks in reverse via the index map and flips inside VMEM — no
host-side jnp.flip pass.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cascade_kernel(reverse: bool):
    def kernel(sos_ref, x_ref, out_ref, z_ref):
        tc = pl.program_id(1)

        @pl.when(tc == 0)
        def _():
            z_ref[:] = jnp.zeros_like(z_ref)

        chunk = x_ref.shape[0]
        n_sections = sos_ref.shape[0]

        def step(t, z):
            # leading-dim dynamic ref indexing (supported on TPU; value-level
            # dynamic_slice is not) — `reverse` walks the chunk backwards
            idx = chunk - 1 - t if reverse else t
            y = x_ref[idx]
            new_z = []
            for s in range(n_sections):  # static unroll (10 sections)
                b0 = sos_ref[s, 0]
                b1 = sos_ref[s, 1]
                b2 = sos_ref[s, 2]
                a1 = sos_ref[s, 4]
                a2 = sos_ref[s, 5]
                out = b0 * y + z[s, 0]
                z1n = b1 * y - a1 * out + z[s, 1]
                z2n = b2 * y - a2 * out
                new_z.append(jnp.stack([z1n, z2n]))
                y = out
            out_ref[idx] = y
            return jnp.stack(new_z)

        z_ref[:] = jax.lax.fori_loop(0, chunk, step, z_ref[:])

    return kernel


_LANE = 128


@functools.partial(
    jax.jit, static_argnames=("reverse", "block_n", "block_t", "interpret")
)
def _cascade_pass(
    x_tnl: jnp.ndarray,
    sos: jnp.ndarray,
    *,
    reverse: bool,
    block_n: int = 4,
    block_t: int = 125,
    interpret: bool = False,
) -> jnp.ndarray:
    """x_tnl: [T, NB, 128] (lane-tiled); one causal cascade pass."""
    t, nb, lane = x_tnl.shape
    s = sos.shape[0]
    # the block's sublane dim (block_n) must be a multiple of 8 or the full
    # array dim; snap to the largest valid divisor of nb
    if nb % block_n or (block_n % 8 and block_n != nb):
        block_n = nb
        for cand in (16, 8):
            if nb % cand == 0 and cand <= nb:
                block_n = cand
                break
    if t % block_t:
        raise ValueError(f"T={t} not divisible by block_t={block_t}")
    grid_t = t // block_t
    grid = (nb // block_n, grid_t)

    if reverse:
        x_index = lambda i, tc: (grid_t - 1 - tc, i, 0)  # noqa: E731
    else:
        x_index = lambda i, tc: (tc, i, 0)  # noqa: E731

    return pl.pallas_call(
        _cascade_kernel(reverse),
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, 6), lambda i, tc: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_t, block_n, lane), x_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_t, block_n, lane), x_index, memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t, nb, lane), jnp.float32),
        scratch_shapes=[pltpu.VMEM((s, 2, block_n, lane), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(sos.astype(jnp.float32), x_tnl.astype(jnp.float32))


def _stack_sos(stages: Sequence) -> np.ndarray:
    return np.concatenate([np.asarray(s, dtype=np.float64) for s in stages], axis=0)


def fused_preprocess(
    x_btc: jnp.ndarray,
    stages: Sequence,
    *,
    detrend: bool = True,
    zscore: bool = False,
    block_n: int = 4,
    block_t: int = 125,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused detrend + combined zero-phase cascade (+ optional per-channel
    z-score) over a batch of windows [B, T, C] -> [B, T, C] f32.

    `stages`: list of [S_i, 6] sos arrays (e.g. from ops.iir.butter_sos).
    `block_n` counts 128-lane tiles of the flattened batch*channel axis.
    """
    sos = jnp.asarray(_stack_sos(stages))
    b, t, c = x_btc.shape
    x = x_btc.astype(jnp.float32)
    if detrend:
        x = x - jnp.mean(x, axis=1, keepdims=True)
    # [B, T, C] -> [T, N/128, 128] (lane-tiled batch*channels, zero-padded)
    n = b * c
    pad = (-n) % _LANE
    x_tn = jnp.transpose(x, (1, 0, 2)).reshape(t, n)
    if pad:
        x_tn = jnp.pad(x_tn, ((0, 0), (0, pad)))
    x_tnl = x_tn.reshape(t, (n + pad) // _LANE, _LANE)
    y = _cascade_pass(x_tnl, sos, reverse=False, block_n=block_n,
                      block_t=block_t, interpret=interpret)
    y = _cascade_pass(y, sos, reverse=True, block_n=block_n,
                      block_t=block_t, interpret=interpret)
    y = y.reshape(t, n + pad)[:, :n]
    out = jnp.transpose(y.reshape(t, b, c), (1, 0, 2))
    if zscore:
        mu = jnp.mean(out, axis=1, keepdims=True)
        sd = jnp.std(out, axis=1, keepdims=True) + 1e-6
        out = (out - mu) / sd
    return out


def collector_stages(fs: float = 125.0):
    """The production collector chain's sos stages (reference:
    Neural_decoding_data_collector.py:111-127)."""
    from neural_speech_decoding_tpu.ops.iir import butter_sos

    return [
        butter_sos("bandstop", 4, 39.5, 40.5, fs),
        butter_sos("bandpass", 2, 3.0, 48.0, fs),
        butter_sos("bandstop", 4, 49.5, 50.5, fs),
        butter_sos("bandstop", 4, 59.0, 61.0, fs),
    ]
