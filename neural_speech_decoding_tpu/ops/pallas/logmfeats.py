"""Pallas TPU kernel: fused whitened-logcov feature extractor.

Round-3 profiling (checkpoints/profile_logcov_r3.log) showed the Pallas
Clenshaw logm at 40.6 ms (degree 128) vs 49.6 ms (degree 320) at B=16384
— ~35 ms of DEGREE-INDEPENDENT overhead around a ~15 ms recurrence. The
overhead is layout, not math: every [B, nb, 8, 8] intermediate on TPU is
tiled (8, 128) on its minor dims, so the 8-wide matrices are padded 16x
in HBM — the gram scatter, shrinkage, symmetrize, spectrum guard,
moveaxis into the kernel, and moveaxis out each move ~0.5 GB of physical
HBM to touch 34 MB of data.

This kernel keeps the band-gram pair-rows layout [nb*P, M] (P = C(C+1)/2
pairs on sublanes, batch on lanes — exactly what ops/pallas/bandcov.py's
inner kernel produces) end to end and fuses, per band, inside one VMEM
block:

  1. shrinkage combine  s = (1-a)*(2/T^2)*gram + a*(tr G/C + eps)*W W^T
  2. spectrum guard     Sylvester PD test of s/tr - lo*I, shrink-where-bad
                        (bit-identical pass-through for in-domain windows)
  3. trace-normalized Chebyshev-Clenshaw matrix log (same recurrence as
     ops/pallas/logm.py: one (C, C, LANES) tensor, 512-lane FMAs)
  4. log(tr/C) diagonal correction + sqrt(2)-weighted triu extraction

One HBM read of the grams and one write of the [nb*P, M] feature rows —
no padded [.., 8, 8] arrays exist anywhere on the path. The only
remaining layout op is the final [nb*P, B] -> [B, nb*P] transpose of a
well-tiled feature matrix.

Differentiable via custom VJP: backward recomputes through the XLA
stages path (models/logcov: _whitened_band_covariances_fused ->
guard_spectrum -> _logm_spd_chebyshev -> triu), which evaluates the same
polynomial.

Reference anchor: this accelerates the serving front-end of the logcov
family that replaces the reference's per-window CPU pipeline
(Neuro-Alpha-App/Utilities/lstm_eeg_model.py:86-101).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 512


def _pair_index(c: int):
    """(i, j) -> pair row p in bandcov/triu order (i <= j)."""
    idx, p = {}, 0
    for i in range(c):
        for j in range(i, c):
            idx[(i, j)] = p
            p += 1
    return idx


def _fused_kernel(
    c: int,
    nb: int,
    degree: int,
    scale: float,
    alpha: float,
    lo: float,
    hi: float,
    guard_g: float | None,
    logm: str = "chebyshev",
    unroll_poles: bool = True,
):
    """Kernel body. Blocks: grams [nb*P, L], traces [nb, L] (already
    scaled by 2/T^2), wwt [nb*P, L] (lane-broadcast constant rows);
    outputs feats [nb*P, L], flags [nb, L]."""
    npairs = c * (c + 1) // 2
    pidx = _pair_index(c)
    diag_rows = [pidx[(i, i)] for i in range(c)]
    sqrt2 = float(np.sqrt(2.0))

    def kernel(coeffs_ref, g_ref, tr_ref, wwt_ref, feats_ref, flags_ref):
        for k in range(nb):
            r0 = k * npairs
            g = g_ref[r0 : r0 + npairs]  # [P, L] unscaled gram pairs
            wwt = wwt_ref[r0 : r0 + npairs]  # [P, L] W W^T pairs
            trg = tr_ref[k : k + 1]  # [1, L] tr(G) * 2/T^2
            # 1. shrinkage combine (same op order as the XLA reference:
            #    grams scaled by 2/T^2 first, then the convex mix)
            s = (1.0 - alpha) * (g * scale) + alpha * (
                trg / c + 1e-12
            ) * wwt

            def row(i, j):
                p = pidx[(min(i, j), max(i, j))]
                return s[p : p + 1]  # [1, L]

            trace = row(0, 0)
            for i in range(1, c):
                trace = trace + row(i, i)

            # 2. spectrum guard (Sylvester PD tests mirroring
            #    models/logcov.domain_flags + guard_spectrum: lambda_min
            #    >= lo iff A - lo*I PD; for a custom hi < C the upper
            #    edge needs the mirror test hi*I - A PD — trace
            #    normalization only bounds lambda_max by C)
            if guard_g is not None:
                tr_df = jnp.maximum(trace, 1e-30) / c

                def pd_ok(entry):
                    """Cholesky-based PD mask of the symmetric matrix
                    given by entry(i, j) -> [1, L] lanes."""
                    low = {}
                    ok = None
                    for j in range(c):
                        d = entry(j, j)
                        for kk in range(j):
                            d = d - low[(j, kk)] * low[(j, kk)]
                        ok = (d > 0) if ok is None else ok & (d > 0)
                        ljj = jnp.sqrt(jnp.maximum(d, 1e-30))
                        for i in range(j + 1, c):
                            t_ij = entry(i, j)
                            for kk in range(j):
                                t_ij = t_ij - low[(i, kk)] * low[(j, kk)]
                            low[(i, j)] = t_ij / ljj
                    return ok

                ok = pd_ok(
                    lambda i, j: row(i, j) / tr_df - lo
                    if i == j
                    else row(i, j) / tr_df
                )
                if hi < c:  # static: not generated for the default hi == C
                    ok = ok & pd_ok(
                        lambda i, j: hi - row(i, j) / tr_df
                        if i == j
                        else -(row(i, j) / tr_df)
                    )
                bad = ~ok  # [1, L]
                tr_gs = trace / c
                badf = bad.astype(s.dtype)
                shrink_diag = guard_g * (tr_gs + 1e-12)  # [1, L]
                # shrunk = (1-g)*s + g*(tr/c + eps)*eye, selected per lane
                s_off = (1.0 - guard_g) * s
                sel = badf  # 1 where shrunk, 0 where original
                rows_new = []
                for i in range(c):
                    for j in range(i, c):
                        p = pidx[(i, j)]
                        shr = s_off[p : p + 1] + (
                            shrink_diag if i == j else 0.0
                        )
                        rows_new.append(
                            sel * shr + (1.0 - sel) * s[p : p + 1]
                        )
                s = jnp.concatenate(rows_new, axis=0)
                flags_ref[k : k + 1] = badf
                trace = row(0, 0)
                for i in range(1, c):
                    trace = trace + row(i, i)
            else:
                flags_ref[k : k + 1] = tr_ref[k : k + 1] * 0.0

            # 3. trace-normalized matrix log
            tr2 = trace / c  # [1, L]
            inv_tr = 1.0 / tr2
            if logm == "rational":
                # resolvent sum: out = c0 I + sum_j v_j (A - p_j I)^{-1},
                # coeffs_ref layout [c0, p_0..p_{M-1}, v_0..v_{M-1}],
                # degree == M. Every shift is SPD (p_j < 0), so the
                # unrolled pivot-free Gauss-Jordan inverse below is
                # stable (pivots >= lambda_min(A) + |p_j| > 0).
                # Matrices live as c row tensors of [c, L] (columns on
                # sublanes, batch on lanes) — the 2D shapes Mosaic lays
                # out well; [1, 1, L] pivot slices of a 3D tensor crash
                # its vector-layout pass.
                a_2d = [
                    jnp.concatenate(
                        [row(i, j) * inv_tr for j in range(c)], axis=0
                    )  # [c, L]
                    for i in range(c)
                ]
                coliota = jax.lax.broadcasted_iota(
                    jnp.int32, a_2d[0].shape, 0
                )
                units = [
                    (coliota == k).astype(a_2d[0].dtype) for k in range(c)
                ]
                # The `degree` resolvent poles are INDEPENDENT GJ
                # eliminations sharing one accumulator, and the two forms
                # below evaluate them with an identical per-pole op
                # sequence and accumulation order (bit-equal results):
                #  - compiled TPU path: Python-unrolled, so Mosaic can
                #    interleave the 12 serial pivot chains for ILP — the
                #    fori_loop form serializes them and stalls the VPU
                #    (measured 235.8 ms vs ~7 ms feats at B=16384,
                #    2026-08-19);
                #  - interpret path: lax.fori_loop traces the body ONCE
                #    (same dynamic-SMEM-read pattern as the Clenshaw loop
                #    below) — the unrolled form compiled a 50k-equation
                #    interpret graph (20+ min XLA:CPU cold compile).
                def pole_step(j, out_rows):
                    p = coeffs_ref[1 + j]
                    m_rows = [a_2d[k] - p * units[k] for k in range(c)]
                    inv_rows = list(units)
                    for i in range(c):
                        r = 1.0 / m_rows[i][i : i + 1]  # [1, L]
                        mrow = m_rows[i] * r  # [c, L]
                        vrow = inv_rows[i] * r
                        # uniform rank-1 form: g_k = m[k, i] - delta_ki
                        # lands row i exactly on the scaled pivot row —
                        # no row-replacement copies needed
                        for k in range(c):
                            g = m_rows[k][i : i + 1] - (
                                1.0 if k == i else 0.0
                            )
                            m_rows[k] = m_rows[k] - g * mrow
                            inv_rows[k] = inv_rows[k] - g * vrow
                    v = coeffs_ref[1 + degree + j]
                    return tuple(
                        out_rows[k] + v * inv_rows[k] for k in range(c)
                    )

                out_rows = tuple(
                    coeffs_ref[0] * units[k] for k in range(c)
                )
                if unroll_poles:
                    for j in range(degree):
                        out_rows = pole_step(j, out_rows)
                else:
                    out_rows = jax.lax.fori_loop(
                        0, degree, pole_step, out_rows
                    )

                def out_entry(i, j):
                    return out_rows[i][j : j + 1, :]  # [1, L]

            else:
                # Chebyshev-Clenshaw (ops/pallas/logm.py recurrence)
                t_rows = []
                for i in range(c):
                    for j in range(c):
                        a_ij = row(i, j) * inv_tr
                        if i == j:
                            t_rows.append(
                                (2.0 * a_ij - (hi + lo)) / (hi - lo)
                            )
                        else:
                            t_rows.append(2.0 * a_ij / (hi - lo))
                t = jnp.concatenate(t_rows, axis=0).reshape(c, c, -1)

                rowi = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                coli = jax.lax.broadcasted_iota(jnp.int32, t.shape, 1)
                eye = (rowi == coli).astype(t.dtype)

                def matmul(a, b):
                    acc = a[:, 0:1, :] * b[0:1, :, :]
                    for j in range(1, c):
                        acc = acc + a[:, j : j + 1, :] * b[j : j + 1, :, :]
                    return acc

                def step(i, carry):
                    b1, b2 = carry
                    ck = coeffs_ref[degree - i]
                    return (ck * eye + 2.0 * matmul(t, b1) - b2, b1)

                zero = t * 0.0  # shares t's layout (Mosaic backedge)
                b1, b2 = jax.lax.fori_loop(
                    0, degree, step, (zero, zero * 1.0)
                )
                out = coeffs_ref[0] * eye + matmul(t, b1) - b2  # [c,c,L]

                def out_entry(i, j):
                    return out[i : i + 1, j, :]  # [1, L]

            # 4. diag correction + weighted triu rows
            logtr = jnp.log(tr2)  # [1, L]
            feats_rows = []
            for i in range(c):
                for j in range(i, c):
                    v = out_entry(i, j)  # [1, L]
                    if i == j:
                        v = v + logtr
                    else:
                        v = v * sqrt2
                    feats_rows.append(v)
            feats_ref[r0 : r0 + npairs] = jnp.concatenate(
                feats_rows, axis=0
            )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "c", "nb", "degree", "scale", "alpha", "lo", "hi", "guard_g",
        "logm", "interpret",
    ),
)
def _fused_batched(
    g_rows: jnp.ndarray,
    tr_rows: jnp.ndarray,
    wwt_rows: jnp.ndarray,
    coeffs: jnp.ndarray,
    *,
    c: int,
    nb: int,
    degree: int,
    scale: float,
    alpha: float,
    lo: float,
    hi: float,
    guard_g: float | None,
    logm: str = "chebyshev",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    rows, m = g_rows.shape
    return pl.pallas_call(
        _fused_kernel(
            c, nb, degree, scale, alpha, lo, hi, guard_g, logm,
            unroll_poles=not interpret,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows, m), g_rows.dtype),
            jax.ShapeDtypeStruct((nb, m), g_rows.dtype),
        ),
        grid=(m // _LANES,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # coeffs
            pl.BlockSpec((rows, _LANES), lambda i: (0, i)),
            pl.BlockSpec((nb, _LANES), lambda i: (0, i)),
            pl.BlockSpec((rows, _LANES), lambda i: (0, 0)),  # wwt const
        ],
        out_specs=(
            pl.BlockSpec((rows, _LANES), lambda i: (0, i)),
            pl.BlockSpec((nb, _LANES), lambda i: (0, i)),
        ),
        interpret=interpret,
    )(coeffs, g_rows, tr_rows, wwt_rows)


def fused_whitened_logcov_feature_rows(
    g_rows: jnp.ndarray,
    tr_scaled: jnp.ndarray,
    wwt_pairs: jnp.ndarray,
    coeffs_tuple,
    *,
    c: int,
    scale: float,
    alpha: float,
    lo: float,
    hi: float,
    guard_g: float | None,
    logm: str = "chebyshev",
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused feature extraction from band-gram pair rows.

    g_rows     [nb*P, B] unscaled gram pairs (bandcov kernel layout)
    tr_scaled  [nb, B]   per-band tr(G) * 2/T^2 (unwhitened trace)
    wwt_pairs  [nb, P]   triu pairs of W_k W_k^T per band
    logm       "chebyshev": coeffs_tuple holds degree+1 Chebyshev
               coefficients of log on [lo, hi]; "rational": coeffs_tuple
               is (c0, p_0..p_{M-1}, v_0..v_{M-1}) of the resolvent sum
               (models/logcov._rational_log_coeffs)
    Returns (feats_rows [nb*P, B] weighted-triu logm entries,
             flags [nb, B] bool out-of-domain per band).
    """
    rows, b = g_rows.shape
    nb = tr_scaled.shape[0]
    npairs = c * (c + 1) // 2
    assert rows == nb * npairs

    m_pad = ((b + _LANES - 1) // _LANES) * _LANES
    if m_pad != b:
        g_rows = jnp.concatenate(
            [g_rows, jnp.zeros((rows, m_pad - b), g_rows.dtype)], axis=1
        )
        # pad traces with 1 so the padding lanes stay finite in-domain
        tr_scaled = jnp.concatenate(
            [tr_scaled, jnp.ones((nb, m_pad - b), tr_scaled.dtype)], axis=1
        )
    wwt_rows = jnp.broadcast_to(
        wwt_pairs.reshape(rows, 1), (rows, _LANES)
    ).astype(g_rows.dtype)
    coeffs = jnp.asarray(coeffs_tuple, dtype=jnp.float32)
    if logm == "rational":
        degree = (len(coeffs_tuple) - 1) // 2  # number of resolvent terms
        assert len(coeffs_tuple) == 1 + 2 * degree
    else:
        degree = len(coeffs_tuple) - 1
    feats, flags = _fused_batched(
        g_rows, tr_scaled, wwt_rows, coeffs,
        c=c, nb=nb, degree=degree, scale=scale, alpha=alpha,
        lo=lo, hi=hi, guard_g=guard_g, logm=logm, interpret=interpret,
    )
    return feats[:, :b], flags[:, :b] > 0.5
