"""Kuramoto-phase spatial filter ("MAI filter"), TPU-first.

Behavioral spec (reference: MindsAI/mindsai_filter_python/core.py:9-51, used
through Utilities/preprocessor.py:21-36):

  1. phases = angle(hilbert(x)) over time, per channel          [T, C]
  2. pairwise desynchrony  P[i,j] = sum_t sin^2(phi_i - phi_j)  [C, C],
     symmetric, diagonal exactly zero
  3. "diag" renorm: d = sqrt(clip(diag(P), 1e-12)); P /= outer(d, d)
     (since diag(P) == 0, this multiplies every entry by 1e12 — a reference
     quirk, see SURVEY.md §7 "fidelity traps"; because it is exactly a
     global scale, it is folded analytically into lambda below so P^T P
     never leaves f32-friendly magnitudes)
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

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops.hilbert import (
    analytic_signal,
    analytic_signal_matmul,
    instantaneous_phase,  # noqa: F401  (re-exported phase helper)
)


def _wide_dtype(precision: str) -> jnp.dtype:
    if precision == "highest" and jax.config.read("jax_enable_x64"):
        return jnp.float64
    return jnp.float32


def _effective_lambda(config: FilterConfig, lambd: Optional[float] = None) -> float:
    """Tailoring lambda with the reference's diag-renorm quirk folded in.

    Reference renorm: P /= outer(d, d), d = sqrt(clip(diag(P), eps)). The
    operator's diagonal is identically zero (the reference pair loop never
    writes it, MindsAI mindsai_filter_python/core.py:18-31), so the clip
    always lands on eps and the whole renorm is exactly a global multiply
    by 1/eps. Folding that scale into lambda — lambda_eff = lambda / eps^2
    — keeps P^T P at O(T^2) instead of ~1e24, which is what lets the f32
    on-device path hold the <=1e-4 logit-fidelity target. Shared by the
    stages and fused-kernel paths so the quirk cannot drift between them.
    """
    if lambd is None:
        lambd = config.lambd
    if config.renorm == "diag":
        lambd = lambd / (config.eps * config.eps)
    return lambd


def _operator_from_gram(gram: jnp.ndarray, t: int) -> jnp.ndarray:
    """Pair-desynchrony operator from gram sums G[..., C, C]:
    P = (T - G) / 2 with the diagonal forced to exactly 0 (the reference's
    pair loop never writes it — same convention as _operator_from_cs).
    Shared by the stages and fused-kernel batch paths."""
    c = gram.shape[-1]
    p = 0.5 * (jnp.asarray(t, gram.dtype) - gram)
    return p * (1.0 - jnp.eye(c, dtype=p.dtype))


def kuramoto_operator(
    phases_tc: jnp.ndarray, *, matmul_precision=jax.lax.Precision.HIGHEST
) -> jnp.ndarray:
    """Pairwise-desynchrony operator from phases [T, C] -> P [C, C]."""
    t = phases_tc.shape[0]
    c2 = jnp.cos(2.0 * phases_tc)
    s2 = jnp.sin(2.0 * phases_tc)
    return _operator_from_cs(c2, s2, t, matmul_precision)


def _operator_from_cs(c2, s2, t, matmul_precision) -> jnp.ndarray:
    # One MXU matmul: [c2; s2]^T [c2; s2] summed over the stacked time axis
    # equals c2^T c2 + s2^T s2.
    m = jnp.concatenate([c2, s2], axis=0)
    gram = jnp.matmul(m.T, m, precision=matmul_precision)
    p = 0.5 * (jnp.asarray(t, c2.dtype) - gram)
    # The reference never writes the diagonal (pair loop skips i == j);
    # force it to exactly 0 so the renorm sees the same clip-to-eps input.
    return p - jnp.diag(jnp.diag(p))


def kuramoto_operator_from_parts(
    re: jnp.ndarray,
    im: jnp.ndarray,
    *,
    matmul_precision=jax.lax.Precision.HIGHEST,
    eps=None,
) -> jnp.ndarray:
    """Operator from (real, imag) of the analytic signal [T, C] —
    transcendental-free: with z = |z| e^{i phi},

      cos 2phi = (re^2 - im^2) / |z|^2,   sin 2phi = 2 re im / |z|^2

    so the angle/cos/sin chain (3 transcendentals per sample) collapses to
    one reciprocal. Exact same math as kuramoto_operator(angle(z)).
    """
    p2 = re * re + im * im
    if eps is None:
        eps = jnp.finfo(re.dtype).tiny
    inv = 1.0 / jnp.maximum(p2, eps)
    # Degenerate samples (z == 0, e.g. an all-zero recording channel):
    # np.angle(0) == 0, so the reference sees phase 0 there -> cos 2phi = 1,
    # sin 2phi = 0. Below-tiny |z|^2 would also make the quotients blow up
    # on denormals, so the same guard covers both.
    degenerate = p2 < eps
    c2 = jnp.where(degenerate, 1.0, (re * re - im * im) * inv)
    s2 = jnp.where(degenerate, 0.0, (2.0 * re * im) * inv)
    return _operator_from_cs(c2, s2, re.shape[0], matmul_precision)


def kuramoto_operator_from_analytic(
    z: jnp.ndarray, *, matmul_precision=jax.lax.Precision.HIGHEST, eps=None
) -> jnp.ndarray:
    return kuramoto_operator_from_parts(
        z.real, z.imag, matmul_precision=matmul_precision, eps=eps
    )


def _mm_tiny(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """[C, C] @ [C, C] as a compensated broadcast multiply-sum, not a dot.

    Under vmap a per-window 8x8 matmul becomes a batched dot_general,
    which XLA pads onto 128x128 MXU tiles — ~16x waste on BOTH operand
    dims. The three 8x8 products in the fast solve (P^T P and the two
    Newton-Schulz refinements) measured ~9 ms of the filter's 21.9 ms at
    B=16384 on a v5e (2026-08-18); as broadcast sums they map to the VPU
    under vmap and cost ~1 ms.

    The arithmetic is fully compensated — Dekker TwoProduct for each
    a[i,k]*b[k,j] plus branch-free Knuth TwoSum for the reduction, errors
    accumulated in a parallel carry term. This matters: a plain jnp.sum
    over f32 products lost ~2x vs the HIGHEST dot it replaces (golden
    logit delta 3.1e-4 — over the 1e-4 budget — because HIGHEST's
    bf16-split passes accumulate partial products exactly), while the
    compensated form is ~f64-quality and measured at IDENTICAL
    throughput: the extra VPU flops on [B, C, C] tiles are free."""
    split = jnp.asarray(4097.0, a.dtype)  # 2^12 + 1, Dekker split for f32
    x = a[:, :, None]  # [i, k, 1]
    y = b[None, :, :]  # [1, k, j]
    p = x * y
    xh = x * split - (x * split - x)
    xl = x - xh
    yh = y * split - (y * split - y)
    yl = y - yh
    perr = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
    s = p[:, 0]
    c = perr[:, 0]
    for k in range(1, p.shape[1]):
        t = p[:, k]
        new = s + t
        bv = new - s
        c = c + ((s - (new - bv)) + (t - bv)) + perr[:, k]
        s = new
    return s + c


def _solve_gauss_jordan(a: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = Y for tiny well-conditioned systems with unrolled
    Gauss-Jordan elimination (no pivoting).

    A = I + lambda P^T P is SPD with unit-plus diagonal, so pivots stay
    >= 1 and pivot-free elimination is stable. Everything is elementwise /
    broadcast math, so under vmap the whole batch runs on the VPU — the
    batched LAPACK-style triangular solve was ~70% of the filter's cost at
    production batch sizes (36 of 50 ms at B=16384).

    a: [C, C], y: [C, T] -> X [C, T].
    """
    c = a.shape[0]
    m = jnp.concatenate([a, y], axis=1)  # [C, C+T]
    for i in range(c):  # static unroll, C is 8
        row = m[i] / m[i, i]
        m = m - m[:, i : i + 1] * row[None, :]
        m = m.at[i].set(row)
    return m[:, c:]


def _ridge_apply_fast(
    x_tc: jnp.ndarray,
    p: jnp.ndarray,
    lambd_eff,
    mm=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Fast-mode ridge tail shared by the stages and fused-kernel paths:
    invert A = I + lambda_eff P^T P (unrolled GJ + one Newton-Schulz
    refinement, all VPU under vmap) and apply to the window."""
    c = x_tc.shape[-1]
    eye = jnp.eye(c, dtype=x_tc.dtype)
    a = eye + jnp.asarray(lambd_eff, x_tc.dtype) * _mm_tiny(p.T, p)
    inv = _solve_gauss_jordan(a, eye)
    # One Newton-Schulz refinement, X <- X (2I - A X): two extra C x C
    # products per window squash the elimination's f32 rounding so the
    # fast path holds the <=1e-4 logit budget too.
    inv = _mm_tiny(inv, 2.0 * eye - _mm_tiny(a, inv))
    return jnp.matmul(x_tc, inv.T, precision=mm)


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
    # HIGHEST matmul precision in every mode: the FLOPs are dominated by
    # the [T, T] Hilbert operator (already HIGHEST); the remaining matmuls
    # (gram [C, 2T]x[2T, C], 8x8 solve, inverse apply) are tiny, but at
    # DEFAULT (bf16 on TPU) the gram alone cost 3e-1 absolute filter error.
    # Measured: no throughput difference on the chip.
    mm = jax.lax.Precision.HIGHEST

    x = x_tc.astype(dtype)
    # The operator comes straight from the analytic signal's (re, im) —
    # no angle/cos/sin transcendentals (kuramoto_operator_from_parts).
    if dtype == jnp.float64:
        # FFT path (scipy-parity, exact in f64; CPU-only — TPU has no c128
        # FFT). FFT straight over the time axis — no transposes around it;
        # the transposed formulation trips XLA:CPU's fft thunk layout check
        # under SPMD partitioning.
        z = analytic_signal(x, axis=0)
        re, im = z.real, z.imag
    else:
        # MXU path: the Hilbert transform of a fixed T is one dense matmul
        # — far faster on TPU than a batched odd-length (625 = 5^4) FFT,
        # and with HIGHEST precision also the most accurate f32 option
        # (the on-device fidelity path). HIGHEST even in fast mode: the
        # [T, T] operator feeds everything downstream and costs the same
        # fused into the batch matmul.
        re, im = analytic_signal_matmul(x, precision=jax.lax.Precision.HIGHEST)
    p = kuramoto_operator_from_parts(re, im, matmul_precision=mm)
    # renorm quirk folded into lambda (see _effective_lambda).
    lambd = _effective_lambda(config, lambd)

    # Solve A @ out^T = x^T (reference inverts A explicitly). Fidelity mode
    # keeps the LAPACK-style solve; the fast path uses unrolled pivot-free
    # Gauss-Jordan, which vectorizes over the batch on the VPU. All C x C
    # products go through _mm_tiny (VPU broadcast sums): batched 8x8
    # dot_generals under vmap pad onto MXU tiles and measured ~9 ms of
    # the filter's 21.9 ms at B=16384 — see _mm_tiny's docstring.
    if config.precision == "fast":
        # invert the tiny system (GJ on [C, 2C]) and apply as one matmul —
        # keeping the T-wide right-hand side out of the elimination steps.
        out = _ridge_apply_fast(x, p, lambd, mm)
    else:
        c = x.shape[-1]
        eye = jnp.eye(c, dtype=dtype)
        a = eye + jnp.asarray(lambd, dtype) * _mm_tiny(p.T, p)
        out = jnp.linalg.solve(a, x.T).T
    return out.astype(jnp.float32)


class KuramotoSpatialFilter:
    """sklearn-style estimator facade over the filter, channels-x-time
    orientation — the vendored package's API surface (reference:
    MindsAI/mindsai_filter_python/core.py:9-51: MindsAIFilter with
    fit/transform on [C, T], `lambd`/`renorm` constructor args)."""

    def __init__(self, lambd: float = 1e-25, renorm: str = "diag"):
        self.lambd = float(lambd)
        self.renorm = renorm
        self._config = FilterConfig(lambd=self.lambd, renorm=renorm)

    def fit(self, X, y=None):
        return self

    def transform(self, X, y=None):
        import numpy as np

        x_ct = np.asarray(X, dtype=np.float64)
        out_tc = jax.jit(lambda w: mai_filter(w, self._config))(x_ct.T)
        return np.asarray(out_tc).T.astype(np.float64)

    def fit_transform(self, X, y=None):
        return self.fit(X, y).transform(X, y)


def kuramoto_spatial_filter(data_ct, lambda_val: float = 1e-25):
    """Function form of the filter on [C, T] data (the vendored package's
    `mindsai_python_filter` call signature, core.py:50-51)."""
    return KuramotoSpatialFilter(lambd=lambda_val).fit_transform(data_ct)


def _mai_filter_batch_fused(
    windows_btc: jnp.ndarray, config: FilterConfig, interpret: bool
) -> jnp.ndarray:
    """Fused-kernel batch path: Hilbert + c2/s2 + pair grams in ONE
    Pallas pass (ops/pallas/kuramoto.py — x is read from HBM once and
    the analytic signal never materializes), then the shared VPU ridge
    tail. Exact same math as vmap(mai_filter) in fast mode."""
    from neural_speech_decoding_tpu.ops.pallas.kuramoto import (
        kuramoto_pair_sums,
    )

    x = windows_btc.astype(jnp.float32)
    t = x.shape[1]
    gram = kuramoto_pair_sums(x, interpret=interpret)  # [B, C, C]
    p = _operator_from_gram(gram, t)
    # renorm quirk folded into lambda (see _effective_lambda).
    lambd = _effective_lambda(config)
    out = jax.vmap(lambda w, pw: _ridge_apply_fast(w, pw, lambd))(x, p)
    return out.astype(jnp.float32)


@partial(jax.jit, static_argnames=("config", "interpret"))
def _mai_filter_batch_impl(
    windows_btc: jnp.ndarray, config: FilterConfig, interpret: bool
) -> jnp.ndarray:
    if (
        config.fused == "kernel"
        and config.precision == "fast"
        and (jax.default_backend() == "tpu" or interpret)
    ):
        return _mai_filter_batch_fused(windows_btc, config, interpret)
    return jax.vmap(lambda w: mai_filter(w, config))(windows_btc)


def mai_filter_batch(
    windows_btc: jnp.ndarray, config: Optional[FilterConfig] = None
) -> jnp.ndarray:
    """Batched filter [B, T, C] -> [B, T, C] f32 — the serving front
    door. Fast mode on TPU routes through the fused Pallas operator
    kernel (config.fused == "kernel", the default); everything else
    takes the XLA stages path via vmap(mai_filter).

    The NSD_FUSED_INTERPRET escape hatch (tests/profiling off-TPU) is
    read HERE, outside the jit, and passed down as a static argument so
    it participates in the jit cache key — toggling the env var after an
    earlier trace at the same (shape, config) gets a fresh trace instead
    of silently reusing the stale route. Callers that close over this
    function in their own jit capture the value at their trace time."""
    config = config or FilterConfig()
    interp = os.environ.get("NSD_FUSED_INTERPRET") == "1"
    return _mai_filter_batch_impl(windows_btc, config, interp)


def mai_filter_batch_sharded(
    windows_btc: jnp.ndarray,
    config: Optional[FilterConfig] = None,
    *,
    mesh,
    axis: str = "dp",
) -> jnp.ndarray:
    """Batched filter over a device mesh: shard_map over the batch axis.

    The fused route's Mosaic custom call cannot be auto-partitioned by
    GSPMD — under a plain jit with dp-sharded inputs the compiler would
    have to all-gather the full batch onto every chip (or fail to
    partition). The filter is embarrassingly batch-parallel, so each
    device runs the (kernel or stages) pipeline on its local shard; the
    per-device batch is padded to the kernel's lane multiple internally.
    This is the route the serving engines take when built with a mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    config = config or FilterConfig()
    spec = P(axis, None, None)
    return shard_map(
        lambda w: mai_filter_batch(w, config),
        mesh=mesh,
        in_specs=(spec,),
        out_specs=spec,
        check_vma=False,
    )(windows_btc)
