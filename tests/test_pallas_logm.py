"""Pallas Chebyshev-logm kernel numerics (interpret mode on CPU; the real
chip measured both faster AND more accurate than TPU f32 eigh — see
ops/pallas/logm.py header)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_speech_decoding_tpu.models.logcov import _cheb_log_coeffs
from neural_speech_decoding_tpu.ops.pallas.logm import (
    _LANES,
    logm_spd_chebyshev_pallas,
)


def _random_spd(m, lo, hi, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(m, 8, 8)))
    lam = rng.uniform(lo, hi, size=(m, 8))
    a = np.einsum("mij,mj,mkj->mik", q, lam, q)
    logm = np.einsum("mij,mj,mkj->mik", q, np.log(lam), q)
    return a.astype(np.float32), logm


@pytest.mark.parametrize("m", [8, _LANES, _LANES + 3])
def test_kernel_matches_exact_logm(m):
    """Kernel (interpret mode) vs the eigendecomposition ground truth,
    including the lane-padding path (m not a multiple of the block)."""
    lo, hi, degree = 0.05, 8.0, 96
    a, truth = _random_spd(m, 0.1, 7.0)
    out = np.asarray(
        logm_spd_chebyshev_pallas(
            jnp.asarray(a), _cheb_log_coeffs(lo, hi, degree), lo, hi,
            interpret=True,
        )
    )
    # f32 matrix-Clenshaw error grows with kappa(A); real-data max is
    # ~4e-3 (vs TPU f32 eigh's ~3e-2 — see module header)
    assert np.abs(out - truth).max() < 1e-2
    assert np.median(np.abs(out - truth)) < 1e-5


def test_kernel_matches_scan_reference():
    """Kernel and the XLA Clenshaw scan are the same math: with identical
    coefficients they agree to f32 rounding."""
    import dataclasses

    from neural_speech_decoding_tpu.models.logcov import (
        LogCovConfig,
        _logm_spd_chebyshev,
    )

    cfg = LogCovConfig()
    a, _ = _random_spd(16, 0.1, 7.0, seed=1)
    s = jnp.asarray(a)[:, None]  # [M, 1, C, C] like band covariances
    scan = np.asarray(_logm_spd_chebyshev(s, cfg))
    lo, hi = cfg.cheb_interval
    kern = np.asarray(
        logm_spd_chebyshev_pallas(
            s, _cheb_log_coeffs(lo, hi, cfg.cheb_degree), lo, hi,
            interpret=True,
        )
    )
    np.testing.assert_allclose(kern, scan, atol=5e-5)


def test_batch_shape_roundtrip():
    """[B, nb, C, C] in, [B, nb, C, C] out, symmetric result."""
    lo, hi, degree = 0.05, 8.0, 64
    a, _ = _random_spd(12, 0.2, 5.0, seed=2)
    s = jnp.asarray(a).reshape(3, 4, 8, 8)
    out = np.asarray(
        logm_spd_chebyshev_pallas(
            s, _cheb_log_coeffs(lo, hi, degree), lo, hi, interpret=True
        )
    )
    assert out.shape == (3, 4, 8, 8)
    np.testing.assert_allclose(out, np.swapaxes(out, -1, -2), atol=1e-4)


def test_kernel_gradient_matches_xla_clenshaw():
    """The kernel has a custom VJP (pallas_call has no transpose rule):
    backward recomputes through the XLA Clenshaw evaluating the SAME
    polynomial, so grads must match the differentiable scan's — this is
    what full-window logcov training on TPU differentiates through."""
    from neural_speech_decoding_tpu.models.logcov import (
        LogCovConfig,
        _logm_spd_chebyshev,
    )

    cfg = LogCovConfig()
    lo, hi = cfg.cheb_interval
    coeffs = _cheb_log_coeffs(lo, hi, 64)
    a, _ = _random_spd(6, 0.1, 7.0, seed=3)
    s = jnp.asarray(a)
    ct = jnp.asarray(
        np.random.default_rng(4).standard_normal((6, 8, 8)).astype(np.float32)
    )

    def loss_kernel(x):
        return jnp.sum(
            logm_spd_chebyshev_pallas(x, coeffs, lo, hi, interpret=True) * ct
        )

    scan_cfg = dataclasses_replace_degree(cfg, 64)

    def loss_scan(x):
        return jnp.sum(_logm_spd_chebyshev(x, scan_cfg) * ct)

    g_kernel = np.asarray(jax.grad(loss_kernel)(s))
    g_scan = np.asarray(jax.grad(loss_scan)(s))
    scale = max(np.abs(g_scan).max(), 1.0)
    np.testing.assert_allclose(g_kernel, g_scan, atol=1e-4 * scale)


def dataclasses_replace_degree(cfg, degree):
    import dataclasses

    return dataclasses.replace(cfg, cheb_degree=degree)
