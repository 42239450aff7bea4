"""Filter-bank log-covariance EEG decoder (tangent-space family).

Covariance-geometry classifiers are the classical strong baseline for
small-sample EEG decoding (CSP / Riemannian tangent-space methods): the
discriminative signal lives in the per-band spatial covariance structure,
and with 179 trials a 100-dim linear model on covariance features is far
better conditioned than a deep net. The reference explored only recurrent
decoders (reference: readme.md:64, lstm_eeg_model.py:13-39); this family
adds the covariance view behind the same registry surface.

TPU mapping — everything is static-shaped dense algebra:
  * ONE rfft over the window, then each band's spatial covariance comes
    straight from Parseval — an einsum over that band's frequency bins
    (no per-band filtering/ifft):  S_band = (2/T^2) Re sum_f X_f X_f^H.
  * shrinkage toward the scaled identity guarantees SPD,
  * matrix log via a batched 8x8 `eigh` (tiny, VPU),
  * upper-triangle vectorization (sqrt(2) off-diagonal weighting — the
    tangent-space isometry), LayerNorm, linear head.
The feature extractor has no parameters, so training never differentiates
through the eigendecomposition.

Input [B, T, C] -> logits [B, num_classes].
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as _np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LogCovConfig:
    num_channels: int = 8
    num_classes: int = 3
    sample_rate: int = 125
    # (lo, hi) Hz edges; the collector chain band-limits to 3-48 Hz, so the
    # bank spans exactly that support (theta / alpha / beta / low gamma)
    bands: Tuple[Tuple[float, float], ...] = (
        (3.0, 8.0),
        (8.0, 13.0),
        (13.0, 30.0),
        (30.0, 48.0),
    )
    # covariance shrinkage toward (tr(S)/C) * I; keeps every band SPD even
    # for degenerate windows
    shrinkage: float = 0.05
    dropout: float = 0.2
    ln_eps: float = 1e-5
    # band-power extraction: "matmul" (ONE stacked [2*bins, T] cos/sin
    # projection matmul — the same dense-operator trick as the matmul
    # Hilbert; odd-length FFTs are slow on TPU) or "fft" (rfft + masked
    # einsum). Numerically identical to ~1e-6 (tests/test_models.py);
    # deployed-checkpoint decode parity is exact in argmax with ~1e-6
    # prob deltas, so the default is the faster matmul path (39 vs 63 ms
    # at B=16384 on chip), which also unlocks the fused whitened
    # front-end (_whitened_band_covariances_fused).
    spectral: str = "matmul"
    # tangent space at the training-set mean covariance instead of at the
    # identity: features become logm(G^-1/2 S G^-1/2) with G fitted per band
    # by fit_whitener (the classical Riemannian tangent-space construction;
    # pure logm(S) is the geometry-agnostic special case G=I). Enabling this
    # adds a non-trainable "whitener" buffer to the params pytree, fitted
    # once via ModelSpec.fit before training.
    whiten: bool = False
    # matrix-log backend. "rational" (default, round 4) evaluates logm as
    # a trace-normalized partial-fraction resolvent sum
    #   log A ~= c0 I + sum_j v_j (A - p_j I)^{-1},   p_j < 0
    # fitted to log on cheb_interval by f64 least squares
    # (_rational_log_coeffs): with logm_terms=12 SPD solves it is ~4x MORE
    # accurate than the degree-320 Chebyshev it replaced (2.99e-6 vs
    # 1.14e-5 max error against f64 eigh on the shipped dataset's whitened
    # band covariances, 2026-08-18) at ~12x fewer VPU ops — the Clenshaw
    # recurrence was ~19 ms of degree-linear FMAs at B=16384 on a v5e.
    # All shifts A - p_j I are SPD (p_j < 0), so the kernel's unrolled
    # pivot-free Gauss-Jordan inverse is stable.
    # "chebyshev" evaluates the trace-normalized Chebyshev matrix
    # polynomial (agreeing with eigh to ~1e-5): on TPU via the
    # lane-batched Pallas Clenshaw kernel (ops/pallas/logm.py — the XLA
    # eigh at ~11k windows/s is the family's serving bottleneck),
    # elsewhere via an XLA Clenshaw scan. "chebyshev_scan" forces the
    # scan; "eigh" is the exact eigendecomposition reference path.
    logm: str = "rational"
    # number of resolvent terms for logm="rational"; poles are log-spaced
    # on -[lo/16, 16*hi] (the widened range measured best in the LS fit)
    logm_terms: int = 12
    # Chebyshev fit of log on this normalized-eigenvalue interval. The
    # shrinkage floor guarantees lambda_norm >= shrinkage for unwhitened
    # covariances (enforced below); whitened ones measure >= 0.013 on the
    # shipped dataset even under aggressive augmentation (6x margin kept).
    # Out-of-domain eigenvalues (e.g. a railed channel, or a flatline of a
    # channel the whitener expected to run hot) make the degree-320
    # polynomial return silent garbage — bounded (trace normalization caps
    # the extrapolation at x=-1.0005) but wrong-sign/magnitude, e.g. +26
    # where the exact log is -7.4. The whitened serving path therefore
    # runs a per-window spectrum guard (guard_domain below): a Cholesky
    # test of lambda_min(S/tr) >= lo flags offending matrices and shrinks
    # ONLY those back into the domain; in-domain windows pass
    # bit-identical. See tests/test_logcov_guard.py.
    cheb_interval: Tuple[float, float] = (0.002, 8.0)
    cheb_degree: int = 320
    # spectrum-guard switch for the polynomial logm backends. On by
    # default; turning it off restores the unguarded round-2 behavior
    # (useful only for kernel microbenchmarks).
    guard_domain: bool = True
    # whitened-serving fusion level. "kernel" (default, round 4): one
    # fused Pallas kernel (ops/pallas/logmfeats.py) keeps the gram
    # pair-rows layout end to end — shrinkage, spectrum guard, matrix
    # log, and triu feature extraction all in VMEM, no padded
    # [.., 8, 8] arrays anywhere. With logm="rational" it measures
    # 9.8 ms feats+head at B=16384 vs 30.9 ms for the round-3 default
    # (stages + chebyshev) on a v5e. "stages": the round-3 pipeline
    # (Pallas band grams -> XLA shrinkage/guard -> logm), whose
    # [B, nb, 8, 8] intermediates are 16x-padded in TPU HBM tiling —
    # kept as the bisection/differentiation reference (the kernel's
    # custom VJP recomputes through it).
    # The kernel branch applies only to whitened matmul-spectral serving
    # with guard_domain on (the flagship path) on TPU; everything else
    # falls back to "stages" automatically.
    fused: str = "kernel"

    def __post_init__(self):
        if self.logm != "eigh" and self.shrinkage < self.cheb_interval[0]:
            raise ValueError(
                f"shrinkage={self.shrinkage} is below the Chebyshev "
                f"interval floor {self.cheb_interval[0]} — the polynomial "
                "logm needs the shrinkage eigenvalue guarantee; raise "
                "shrinkage, widen cheb_interval, or use logm='eigh'"
            )


def _num_features(cfg: LogCovConfig) -> int:
    c = cfg.num_channels
    return len(cfg.bands) * (c * (c + 1)) // 2


def init_logcov_params(rng: jax.Array, cfg: LogCovConfig) -> Params:
    n = _num_features(cfg)
    kw, _ = jax.random.split(rng)
    params = {
        "ln": {
            "scale": jnp.ones((n,), jnp.float32),
            "bias": jnp.zeros((n,), jnp.float32),
        },
        "head": {
            "w": jax.random.normal(kw, (n, cfg.num_classes), jnp.float32)
            * jnp.sqrt(1.0 / n),
            "b": jnp.zeros((cfg.num_classes,), jnp.float32),
        },
    }
    if cfg.whiten:
        # identity until fit_whitener runs — a fixed buffer, excluded from
        # gradients by stop_gradient in logcov_features and from adamw's
        # decoupled weight decay by the optimizer's "whitener" mask
        # (train/loop._optimizer)
        params["whitener"] = jnp.broadcast_to(
            jnp.eye(cfg.num_channels, dtype=jnp.float32),
            (len(cfg.bands), cfg.num_channels, cfg.num_channels),
        )
    return params


def fit_whitener(params: Params, x_btc, y=None, *, cfg: LogCovConfig) -> Params:
    """Fit the tangent-point whitener G^-1/2 per band on TRAINING windows
    (G = arithmetic mean of the shrunk band covariances — the standard
    cheap stand-in for the Riemannian mean) and return updated params."""
    g = jnp.mean(band_covariances(jnp.asarray(x_btc, jnp.float32), cfg), axis=0)
    w, v = jnp.linalg.eigh(g)  # [nb, C] / [nb, C, C]
    inv_sqrt = jnp.einsum(
        "nij,nj,nkj->nik", v, 1.0 / jnp.sqrt(jnp.maximum(w, 1e-12)), v
    )
    return {**params, "whitener": inv_sqrt.astype(jnp.float32)}


@functools.lru_cache(maxsize=8)
def _band_projector(t: int, cfg: LogCovConfig):
    """[sum_k 2*bins_k, T] stacked cos/sin DFT rows (f64-built, f32-cast)
    plus each band's row slice. X_f = cos_row . x - i sin_row . x, so
    sum_{f in band} Re(X_a conj(X_b)) = (P x_a) . (P x_b) over that band's
    cos AND sin rows — the whole filter bank is one dense matmul."""
    freqs = _np.fft.rfftfreq(t, d=1.0 / cfg.sample_rate)
    tt = _np.arange(t)
    rows, slices, start = [], [], 0
    for lo, hi in cfg.bands:
        bins = _np.flatnonzero((freqs >= lo) & (freqs < hi))
        ang = 2.0 * _np.pi * _np.outer(bins, tt) / t
        rows.append(_np.cos(ang))
        rows.append(_np.sin(ang))
        slices.append(slice(start, start + 2 * len(bins)))
        start += 2 * len(bins)
    return _np.concatenate(rows).astype(_np.float32), tuple(slices)


def band_covariances(x_btc: jnp.ndarray, cfg: LogCovConfig) -> jnp.ndarray:
    """[B, T, C] -> per-band spatial covariances [B, n_bands, C, C]."""
    t = x_btc.shape[1]
    x = x_btc - jnp.mean(x_btc, axis=1, keepdims=True)
    if cfg.spectral == "matmul":
        proj, slices = _band_projector(t, cfg)
        y = jnp.einsum(
            "rt,btc->brc", jnp.asarray(proj), x,
            precision=jax.lax.Precision.HIGHEST,
        )
        covs = [
            jnp.einsum(
                "brc,brd->bcd", y[:, sl], y[:, sl],
                precision=jax.lax.Precision.HIGHEST,
            )
            * (2.0 / (t * t))
            for sl in slices
        ]
    elif cfg.spectral == "fft":
        xf = jnp.fft.rfft(x, axis=1)  # [B, F, C] complex
        freqs = jnp.fft.rfftfreq(t, d=1.0 / cfg.sample_rate)  # [F]
        covs = []
        for lo, hi in cfg.bands:
            m = ((freqs >= lo) & (freqs < hi)).astype(jnp.float32)
            # Parseval: cov over time of the band-limited signal, without
            # ever synthesizing it. rfft halves the spectrum -> x2 (DC is
            # masked out by lo >= 3 Hz; odd T has no Nyquist bin).
            xm = xf * m[None, :, None]
            s = jnp.einsum("bfc,bfd->bcd", xm, jnp.conj(xf)).real * (2.0 / (t * t))
            covs.append(s)
    else:
        raise ValueError(f"unknown spectral method {cfg.spectral!r}")
    s = jnp.stack(covs, axis=1)  # [B, nb, C, C]
    s = 0.5 * (s + jnp.swapaxes(s, -1, -2))  # enforce exact symmetry
    c = cfg.num_channels
    trace = jnp.trace(s, axis1=-2, axis2=-1)[..., None, None]
    eye = jnp.eye(c, dtype=s.dtype)
    return (1.0 - cfg.shrinkage) * s + cfg.shrinkage * (trace / c + 1e-12) * eye


@functools.lru_cache(maxsize=8)
def _cheb_log_coeffs(lo: float, hi: float, degree: int) -> Tuple[float, ...]:
    """f64 Chebyshev coefficients of log on [lo, hi] (numpy convention:
    f = sum c_k T_k, c_0 unhalved)."""
    cheb = _np.polynomial.chebyshev.Chebyshev.interpolate(
        _np.log, degree, domain=[lo, hi]
    )
    return tuple(float(c) for c in cheb.coef)


def _logm_spd_chebyshev(s: jnp.ndarray, cfg: LogCovConfig) -> jnp.ndarray:
    """logm of batched SPD matrices as a Chebyshev matrix polynomial.

    Trace-normalize (A = S / (tr S / C), so log S = log A + log(tr S / C) I
    with normalized eigenvalues in (0, C]), then evaluate the series with a
    matrix Clenshaw recurrence — a lax.scan whose body is ONE batched C x C
    matmul. No eigendecomposition. The TPU production path is the Pallas
    kernel (ops/pallas/logm.py); this scan is the portable reference the
    kernel is tested against."""
    c = s.shape[-1]
    lo, hi = cfg.cheb_interval
    coeffs = jnp.asarray(
        _cheb_log_coeffs(lo, hi, cfg.cheb_degree), dtype=s.dtype
    )
    eye = jnp.eye(c, dtype=s.dtype)
    trace = jnp.trace(s, axis1=-2, axis2=-1)[..., None, None] / c
    a = s / trace
    # affine map onto Chebyshev domain: t has eigenvalues in [-1, 1]
    t = (2.0 * a - (hi + lo) * eye) / (hi - lo)

    # HIGHEST precision: the TPU default lowers f32 matmuls to bf16 passes,
    # which wrecks a 256-step recurrence (0.18 feature error measured)
    mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def clenshaw_step(carry, ck):
        b1, b2 = carry
        b0 = ck * eye + 2.0 * mm(t, b1) - b2
        return (b0, b1), None

    zero = jnp.zeros_like(t)
    (b1, b2), _ = jax.lax.scan(
        clenshaw_step, (zero, zero), coeffs[1:][::-1]
    )
    logm_a = coeffs[0] * eye + mm(t, b1) - b2
    return logm_a + jnp.log(trace) * eye


@functools.lru_cache(maxsize=8)
def _rational_log_coeffs(
    lo: float, hi: float, terms: int
) -> Tuple[float, Tuple[float, ...], Tuple[float, ...]]:
    """(c0, poles, weights) of the partial-fraction fit
    log x ~= c0 + sum_j w_j / (x - p_j) on [lo, hi], fitted in f64 by
    least squares on a 4000-point log grid. Poles are log-spaced on
    -[lo/16, 16*hi]; the widened range measured 2.2e-6 max fit error at
    terms=12 vs 1.1e-5 for poles confined to -[lo/4, 4*hi]."""
    xs = _np.geomspace(lo, hi, 4000)
    poles = -_np.geomspace(lo / 16.0, hi * 16.0, terms)
    a = _np.concatenate(
        [_np.ones((xs.size, 1)), 1.0 / (xs[:, None] - poles[None, :])],
        axis=1,
    )
    coef, *_ = _np.linalg.lstsq(a, _np.log(xs), rcond=None)
    return (
        float(coef[0]),
        tuple(float(p) for p in poles),
        tuple(float(w) for w in coef[1:]),
    )


def _inv_tiny_spd(m: jnp.ndarray) -> jnp.ndarray:
    """Batched [..., C, C] SPD inverse by unrolled pivot-free Gauss-Jordan
    in the uniform rank-1 form (g = m[.., i] - e_i lands the pivot row
    exactly on its scaled value, so no row replacement is needed).

    Everything is broadcast/elementwise math, so the whole batch runs on
    the VPU: batched LAPACK-style jnp.linalg.solve on [B*nb, 8, 8] shifts
    measured ~900 ms at B=4096 on a v5e (TPU custom-call path), while
    this unroll is the same ~1 ms-scale cost as the filter's 8x8 solve.
    Differentiable (pure jnp ops) for the custom-VJP recompute path."""
    c = m.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(c, dtype=m.dtype), m.shape)
    inv = eye
    for i in range(c):
        r = 1.0 / m[..., i : i + 1, i : i + 1]
        mrow = m[..., i : i + 1, :] * r
        vrow = inv[..., i : i + 1, :] * r
        g = m[..., :, i : i + 1] - eye[..., :, i : i + 1]
        m = m - g * mrow
        inv = inv - g * vrow
    return inv


def _logm_spd_rational(s: jnp.ndarray, cfg: LogCovConfig) -> jnp.ndarray:
    """logm of batched SPD matrices as a resolvent (partial-fraction) sum.

    Trace-normalize as in _logm_spd_chebyshev, then
    log A ~= c0 I + sum_j v_j (A - p_j I)^{-1} with all shifts SPD
    (p_j < 0, so pivot-free elimination is stable). The portable
    reference for the fused kernel's rational mode
    (ops/pallas/logmfeats.py) and the custom-VJP recompute path."""
    c = s.shape[-1]
    lo, hi = cfg.cheb_interval
    c0, poles, weights = _rational_log_coeffs(lo, hi, cfg.logm_terms)
    eye = jnp.eye(c, dtype=s.dtype)
    trace = jnp.trace(s, axis1=-2, axis2=-1)[..., None, None] / c
    a = s / trace
    out = c0 * jnp.broadcast_to(eye, a.shape)
    for p, v in zip(poles, weights):
        out = out + v * _inv_tiny_spd(a - p * eye)
    return out + jnp.log(trace) * eye


def _pd_mask(m: jnp.ndarray) -> jnp.ndarray:
    """Batched positive-definite test on [..., C, C]: Sylvester's
    criterion via an UNROLLED Cholesky — every pivot of the factorization
    must be positive. Pure elementwise/VPU work over the batch: XLA's
    blocked `jnp.linalg.cholesky` on [B*nb, 8, 8] costs ~141 ms at
    B=16384 on chip (more than the entire Pallas logm); this unroll is
    ~C^3/3 scalar FMAs per matrix, ~2 ms. Clamped pivots keep the
    discarded factor finite once a non-positive pivot has already
    answered the question."""
    c = m.shape[-1]
    low = {}
    ok = None
    for j in range(c):
        s = m[..., j, j]
        for k in range(j):
            s = s - low[(j, k)] * low[(j, k)]
        ok = (s > 0) if ok is None else ok & (s > 0)
        ljj = jnp.sqrt(jnp.maximum(s, 1e-30))
        for i in range(j + 1, c):
            t = m[..., i, j]
            for k in range(j):
                t = t - low[(i, k)] * low[(j, k)]
            low[(i, j)] = t / ljj
    return ok


def domain_flags(s: jnp.ndarray, cfg: LogCovConfig) -> jnp.ndarray:
    """Per-matrix bool [..,]: trace-normalized spectrum outside the
    Chebyshev fit domain [lo, hi].

    lambda_min(A) >= lo iff A - lo*I is PD (Sylvester test, _pd_mask) —
    exact, no eigensolver. The upper edge is free for the default
    interval: a trace-normalized SPD matrix has eigenvalues summing to C,
    so lambda_max <= C = hi; a custom hi < C adds the mirror test."""
    c = s.shape[-1]
    lo, hi = cfg.cheb_interval
    eye = jnp.eye(c, dtype=s.dtype)
    tr = jnp.maximum(jnp.trace(s, axis1=-2, axis2=-1), 1e-30)[..., None, None] / c
    a = s / tr
    bad = ~_pd_mask(a - lo * eye)
    if hi < c:
        bad = bad | ~_pd_mask(hi * eye - a)
    return bad


def _guard_strength(cfg: LogCovConfig) -> float:
    """Shrinkage coefficient g such that (1-g)*S + g*(tr/C)*I is certain to
    land in the Chebyshev domain: lambda'_norm = (1-g)*lambda_norm + g, so
    g >= lo floors the spectrum, and for a custom hi < C the upper edge
    needs g >= (C-hi)/(C-1) since lambda_norm <= C."""
    c = cfg.num_channels
    lo, hi = cfg.cheb_interval
    g = max(cfg.shrinkage, 2.0 * lo)
    if hi < c:
        g = max(g, (c - hi) / (c - 1.0) * 1.001)
    return g


def guard_spectrum(
    s: jnp.ndarray, cfg: LogCovConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Clamp out-of-domain matrices back into the Chebyshev domain.

    Returns (guarded [.., C, C], flags [..]). Flagged matrices are shrunk
    toward (tr/C)*I hard enough to guarantee the domain (so the polynomial
    evaluates a bounded, identity-like log instead of extrapolating);
    unflagged matrices pass through bit-identical, preserving parity with
    checkpoints trained without the guard."""
    bad = domain_flags(s, cfg)
    c = s.shape[-1]
    tr = jnp.trace(s, axis1=-2, axis2=-1)[..., None, None] / c
    eye = jnp.eye(c, dtype=s.dtype)
    g = _guard_strength(cfg)
    shrunk = (1.0 - g) * s + g * (tr + 1e-12) * eye
    return jnp.where(bad[..., None, None], shrunk, s), bad


def _project_and_fold_whitener(x_btc: jnp.ndarray, cfg: LogCovConfig, w0):
    """Shared front half of the whitened matmul spectral method: center,
    band-project, fold the per-band whitener into the projected rows (the
    reordering identity documented in _whitened_band_covariances_fused).
    ONE implementation on purpose — the fused Pallas forward
    (_fused_kernel_forward) and the stages path its custom VJP recomputes
    through must evaluate the exact same prefix or gradients would be
    taken of a different function than was evaluated.

    Returns (yw [B, R, C] whitened projection rows, y [B, R, C] unmixed
    rows — their row-energies carry tr G — band slices, T)."""
    t = x_btc.shape[1]
    x = x_btc - jnp.mean(x_btc, axis=1, keepdims=True)
    proj, slices = _band_projector(t, cfg)
    hp = jax.lax.Precision.HIGHEST
    y = jnp.einsum("rt,btc->brc", jnp.asarray(proj), x, precision=hp)
    # static row -> band map; w_rows[r] = W_band(r)
    band_idx = _np.concatenate(
        [_np.full(sl.stop - sl.start, k) for k, sl in enumerate(slices)]
    )
    w_rows = w0[jnp.asarray(band_idx)]  # [R, C, C]
    yw = jnp.einsum("brc,rdc->brd", y, w_rows, precision=hp)  # y @ W_k^T
    return yw, y, slices, t


def _band_traces_scaled(y: jnp.ndarray, slices, t: int) -> jnp.ndarray:
    """[nb, B] per-band tr(G) * 2/T^2 from the unmixed projection rows."""
    sq = jnp.sum(y * y, axis=-1)  # [B, R]
    tr = jnp.stack(
        [jnp.sum(sq[:, sl.start : sl.stop], axis=1) for sl in slices], axis=0
    )
    return tr * (2.0 / (t * t))


def _whitened_band_covariances_fused(
    x_btc: jnp.ndarray, cfg: LogCovConfig, w0: jnp.ndarray
) -> jnp.ndarray:
    """Whitened per-band covariances with the whitener FOLDED into the
    projected rows — the TPU fast path for the matmul spectral method.

    Identity (exact, just reordered):
      W·[(1-a)·G + a·(tr G/C + eps)·I]·W^T
        = (1-a)·gram(Y W^T) · (2/T^2) + a·(tr G/C + eps)·W W^T
    so the expensive batched [8 x 8] whitening sandwich (measured ~27 ms
    at B=16384 — tiny-matmul MXU padding) becomes one cheap row-wise
    channel mix on the projection output, and the per-band grams go
    through the lane-batched Pallas kernel (ops/pallas/bandcov.py)
    instead of padded einsum matmuls (~35 ms -> ~1 ms)."""
    c = cfg.num_channels
    yw, y, slices, t = _project_and_fold_whitener(x_btc, cfg, w0)
    hp = jax.lax.Precision.HIGHEST
    import os

    interp = os.environ.get("NSD_BANDCOV_INTERPRET") == "1"
    if jax.default_backend() == "tpu" or interp:
        # interp: tests exercise the kernel branch off-chip via the Pallas
        # interpreter (slow but faithful to the wrapper's layout logic)
        from neural_speech_decoding_tpu.ops.pallas.bandcov import band_grams

        g_w = band_grams(yw, slices, interpret=interp)
    else:
        g_w = jnp.stack(
            [
                jnp.einsum("brc,brd->bcd", yw[:, sl], yw[:, sl], precision=hp)
                for sl in slices
            ],
            axis=1,
        )
    g_w = g_w * (2.0 / (t * t))
    # shrinkage reconstructed in whitened space: a*(tr G/C + eps)*W W^T
    tr_g = _band_traces_scaled(y, slices, t).T  # [B, nb]
    wwt = jnp.einsum("nij,nkj->nik", w0, w0, precision=hp)
    return (1.0 - cfg.shrinkage) * g_w + cfg.shrinkage * (
        tr_g[..., None, None] / c + 1e-12
    ) * wwt[None]


def _fused_kernel_forward(x_btc, w0, cfg: LogCovConfig, interpret: bool):
    """Whitened logcov features + guard flags via the single fused Pallas
    kernel (ops/pallas/logmfeats.py): band-gram pair rows stay lane-major
    from the gram kernel through shrinkage, spectrum guard, Clenshaw logm
    and triu extraction — no 16x-padded [B, nb, 8, 8] intermediates."""
    from neural_speech_decoding_tpu.ops.pallas.bandcov import (
        _LANES as _BC_LANES,
        _grams_batched,
    )
    from neural_speech_decoding_tpu.ops.pallas.logmfeats import (
        _LANES as _LF_LANES,
        fused_whitened_logcov_feature_rows,
    )

    c = cfg.num_channels
    yw, y, slices, t = _project_and_fold_whitener(x_btc, cfg, w0)
    hp = jax.lax.Precision.HIGHEST

    b, r = yw.shape[0], yw.shape[1]
    lanes = max(_BC_LANES, _LF_LANES)
    m_pad = ((b + lanes - 1) // lanes) * lanes
    y_crb = jnp.swapaxes(jnp.moveaxis(yw, 0, -1), 0, 1)  # [C, R, B]
    if m_pad != b:
        y_crb = jnp.concatenate(
            [y_crb, jnp.zeros((c, r, m_pad - b), y_crb.dtype)], axis=-1
        )
    sl = tuple((s.start, s.stop) for s in slices)
    g_rows = _grams_batched(y_crb, sl, c, interpret=interpret)  # [nb*P, M]

    scale = 2.0 / (t * t)
    tr_scaled = _band_traces_scaled(y, slices, t)  # [nb, B]
    if m_pad != b:
        tr_scaled = jnp.concatenate(
            [
                tr_scaled,
                jnp.zeros((len(slices), m_pad - b), tr_scaled.dtype),
            ],
            axis=1,
        )

    iu, ju = jnp.triu_indices(c)
    wwt = jnp.einsum("nij,nkj->nik", w0, w0, precision=hp)
    wwt_pairs = wwt[:, iu, ju]  # [nb, P]

    lo, hi = cfg.cheb_interval
    if cfg.logm == "rational":
        c0, poles, wts = _rational_log_coeffs(lo, hi, cfg.logm_terms)
        coeffs, mode = (c0,) + poles + wts, "rational"
    else:
        coeffs, mode = _cheb_log_coeffs(lo, hi, cfg.cheb_degree), "chebyshev"
    feats_rows, flag_rows = fused_whitened_logcov_feature_rows(
        g_rows,
        tr_scaled,
        wwt_pairs,
        coeffs,
        c=c,
        scale=scale,
        alpha=cfg.shrinkage,
        lo=lo,
        hi=hi,
        guard_g=_guard_strength(cfg),
        logm=mode,
        interpret=interpret,
    )
    feats = feats_rows[:, :b].T  # [B, nb*P] — row k*P+p == triu order
    flags = jnp.any(flag_rows[:, :b], axis=0)
    return feats, flags


def _stages_feats_reference(x_btc, w0, cfg: LogCovConfig):
    """The differentiable stages path computing the same features —
    custom-VJP backward of the fused kernel recomputes through this."""
    s = _whitened_band_covariances_fused(x_btc, cfg, w0)
    s, _ = guard_spectrum(s, cfg)
    logm = (
        _logm_spd_rational(s, cfg)
        if cfg.logm == "rational"
        else _logm_spd_chebyshev(s, cfg)
    )
    c = cfg.num_channels
    iu, ju = jnp.triu_indices(c)
    weights = jnp.where(iu == ju, 1.0, jnp.sqrt(2.0)).astype(jnp.float32)
    feats = logm[..., iu, ju] * weights
    return feats.reshape(feats.shape[0], -1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_kernel_feats(x_btc, w0, cfg, interpret):
    return _fused_kernel_forward(x_btc, w0, cfg, interpret)


def _fused_kernel_feats_fwd(x_btc, w0, cfg, interpret):
    return _fused_kernel_feats(x_btc, w0, cfg, interpret), (x_btc, w0)


def _fused_kernel_feats_bwd(cfg, interpret, res, ct):
    x_btc, w0 = res
    ct_feats, _ = ct  # flags are boolean — no cotangent
    _, vjp = jax.vjp(lambda x: _stages_feats_reference(x, w0, cfg), x_btc)
    (dx,) = vjp(ct_feats)
    # the whitener is a fitted buffer, not a weight (stop_gradient in the
    # stages path) — zero cotangent keeps the same semantics
    return dx, jnp.zeros_like(w0)


_fused_kernel_feats.defvjp(_fused_kernel_feats_fwd, _fused_kernel_feats_bwd)


def logcov_features(
    x_btc: jnp.ndarray,
    cfg: LogCovConfig,
    whitener: Optional[jnp.ndarray] = None,
    *,
    with_flags: bool = False,
):
    """[B, T, C] -> tangent-space feature vectors [B, n_features].

    `with_flags=True` additionally returns the per-window guard flags
    [B] bool (any band's covariance outside the Chebyshev domain — the
    runtime fault signal the reference's own fault injectors motivate,
    reference: Minds_AI_Filter_Real-time_Signal_Analysis.py:141-162)."""
    if whitener is not None and cfg.spectral == "matmul":
        w0 = jax.lax.stop_gradient(whitener)  # fixed buffer, not a weight
        import os

        fused_interp = os.environ.get("NSD_FUSED_INTERPRET") == "1"
        if (
            cfg.fused == "kernel"
            and cfg.logm in ("chebyshev", "rational")
            and cfg.guard_domain
            and (jax.default_backend() == "tpu" or fused_interp)
        ):
            feats, flags = _fused_kernel_feats(
                x_btc.astype(jnp.float32), w0, cfg, fused_interp
            )
            if with_flags:
                return feats, flags
            return feats
        s = _whitened_band_covariances_fused(
            x_btc.astype(jnp.float32), cfg, w0
        )
    elif whitener is not None:
        w0 = jax.lax.stop_gradient(whitener)
        s = band_covariances(x_btc.astype(jnp.float32), cfg)
        s = jnp.einsum("nij,bnjk,nkl->bnil", w0, s, w0)
        s = 0.5 * (s + jnp.swapaxes(s, -1, -2))
    else:
        s = band_covariances(x_btc.astype(jnp.float32), cfg)
    # Spectrum guard: the shrinkage floor in band_covariances guarantees
    # the domain for UNWHITENED covariances (enforced in __post_init__),
    # but whitening re-scales the spectrum with no such bound, and a
    # custom hi < C interval is unguaranteed either way. Only the
    # polynomial backends extrapolate; eigh degrades boundedly on its own.
    flags = None
    polynomial = cfg.logm in ("chebyshev", "chebyshev_scan", "rational")
    at_risk = whitener is not None or cfg.cheb_interval[1] < cfg.num_channels
    if cfg.guard_domain and polynomial and at_risk:
        s, band_flags = guard_spectrum(s, cfg)
        flags = jnp.any(band_flags, axis=-1)
    elif with_flags:
        flags = (
            jnp.any(domain_flags(s, cfg), axis=-1)
            if at_risk
            else jnp.zeros(s.shape[0], bool)
        )
    if cfg.logm == "chebyshev" and jax.default_backend() == "tpu":
        # trace-time dispatch: jit targets the default backend here
        from neural_speech_decoding_tpu.ops.pallas.logm import (
            logm_spd_chebyshev_pallas,
        )

        lo, hi = cfg.cheb_interval
        logm = logm_spd_chebyshev_pallas(
            s, _cheb_log_coeffs(lo, hi, cfg.cheb_degree), lo, hi
        )
    elif cfg.logm in ("chebyshev", "chebyshev_scan"):
        logm = _logm_spd_chebyshev(s, cfg)
    elif cfg.logm == "rational":
        logm = _logm_spd_rational(s, cfg)
    elif cfg.logm == "eigh":
        w, v = jnp.linalg.eigh(s)  # batched 8x8
        logm = jnp.einsum(
            "...ij,...j,...kj->...ik", v, jnp.log(jnp.maximum(w, 1e-12)), v
        )
    else:
        raise ValueError(f"unknown logm backend {cfg.logm!r}")
    c = cfg.num_channels
    iu, ju = jnp.triu_indices(c)
    weights = jnp.where(iu == ju, 1.0, jnp.sqrt(2.0)).astype(jnp.float32)
    feats = logm[..., iu, ju] * weights  # [B, nb, C(C+1)/2]
    feats = feats.reshape(feats.shape[0], -1)
    if with_flags:
        if flags is None:
            flags = jnp.zeros(feats.shape[0], bool)
        return feats, flags
    return feats


def logcov_head_apply(
    params: Params,
    feats: jnp.ndarray,
    cfg: LogCovConfig = LogCovConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """LayerNorm + dropout + linear head on PRECOMPUTED tangent-space
    features (the output of logcov_features).

    The feature extractor is parameter-free (the whitener is a frozen
    buffer), so training pipelines featurize each window ONCE and run
    every epoch in this tiny head space instead of re-evaluating the
    band covariances + 320-step Clenshaw per step — identical numbers,
    ~10x faster sweeps (tools/crossval.py uses it via ModelSpec.featurize
    / head_apply)."""
    if train and rng is None:
        raise ValueError("train=True requires rng")
    f = feats
    mean = jnp.mean(f, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(f - mean), axis=-1, keepdims=True)
    f = (f - mean) / jnp.sqrt(var + cfg.ln_eps)
    f = f * params["ln"]["scale"] + params["ln"]["bias"]
    if train and cfg.dropout > 0:
        keep = 1.0 - cfg.dropout
        f = jnp.where(jax.random.bernoulli(rng, keep, f.shape), f / keep, 0.0)
    return f @ params["head"]["w"] + params["head"]["b"]


def logcov_apply_ex(
    params: Params,
    x_btc: jnp.ndarray,
    cfg: LogCovConfig = LogCovConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """logcov_apply plus an aux dict: {"domain_flags": [B] bool} — windows
    whose (whitened) covariance spectrum fell outside the Chebyshev domain
    and was clamped by guard_spectrum. Serving engines surface the count
    in their stats so degraded electrodes are detected, not silent."""
    if train and rng is None:
        raise ValueError("train=True requires rng")
    # whitening keys off the CHECKPOINT, not the config: a params pytree
    # carrying a fitted "whitener" buffer is always served whitened, so a
    # whitened checkpoint loaded under a default config (no model_kw) can
    # never be silently decoded against the wrong tangent point.
    # cfg.whiten only controls init/fit (whether the buffer exists at all).
    f, flags = logcov_features(
        x_btc, cfg, whitener=params.get("whitener"), with_flags=True
    )
    logits = logcov_head_apply(params, f, cfg, train=train, rng=rng)
    return logits, {"domain_flags": flags}


def logcov_apply(
    params: Params,
    x_btc: jnp.ndarray,
    cfg: LogCovConfig = LogCovConfig(),
    *,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    return logcov_apply_ex(params, x_btc, cfg, train=train, rng=rng)[0]
