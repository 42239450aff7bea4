"""Fused whitened band-covariance front-end (ops/pallas/bandcov.py +
models/logcov._whitened_band_covariances_fused).

The fold identity must be exact up to fp reordering:
  W [(1-a) G + a (tr G/C + eps) I] W^T
    = (1-a) (2/T^2) gram(Y W^T) + a (tr G/C + eps) W W^T
so the fused path's covariances — and the features/flags downstream —
must match the reference whiten-sandwich path to fp noise.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoding_tpu.models import logcov as lc
from neural_speech_decoding_tpu.ops.pallas.bandcov import band_grams


def _fitted(dataset, cfg):
    params = lc.init_logcov_params(jax.random.PRNGKey(0), cfg)
    return lc.fit_whitener(params, dataset.windows[:48], cfg=cfg)["whitener"]


@pytest.mark.slow
def test_gram_kernel_interpret_matches_einsum():
    rng = np.random.default_rng(0)
    slices, start = [], 0
    for bins in (15, 15, 20, 25, 30, 40, 40, 40):
        slices.append(slice(start, start + 2 * bins))
        start += 2 * bins
    y = rng.standard_normal((37, start, 8)).astype(np.float32)
    got = np.asarray(band_grams(jnp.asarray(y), slices, interpret=True))
    ref = np.stack(
        [np.einsum("brc,brd->bcd", y[:, sl], y[:, sl]) for sl in slices],
        axis=1,
    )
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())
    # exactly symmetric by construction
    np.testing.assert_array_equal(got, np.swapaxes(got, -1, -2))


def test_fused_covariances_match_reference_path(dataset):
    cfg = lc.LogCovConfig(whiten=True, spectral="matmul")
    w0 = _fitted(dataset, cfg)
    x = jnp.asarray(dataset.windows[48:64], jnp.float32)

    fused = np.asarray(lc._whitened_band_covariances_fused(x, cfg, w0))
    s = lc.band_covariances(x, cfg)
    ref = jnp.einsum("nij,bnjk,nkl->bnil", w0, s, w0)
    ref = np.asarray(0.5 * (ref + jnp.swapaxes(ref, -1, -2)))
    # rtol for the O(1) entries; atol covers near-zero off-diagonals where
    # fp reordering leaves ~1e-5 absolute noise
    np.testing.assert_allclose(fused, ref, rtol=2e-4, atol=2e-5)


def test_fused_features_and_flags_match(dataset):
    """End-to-end: features and guard flags agree between the fused
    matmul path and the fft + whiten-sandwich path."""
    base = lc.LogCovConfig(whiten=True, logm="chebyshev_scan", spectral="fft")
    fused_cfg = dataclasses.replace(base, spectral="matmul")
    w0 = _fitted(dataset, base)
    clean = np.asarray(dataset.windows[48], np.float32)
    railed = np.asarray(dataset.windows[49], np.float32).copy()
    railed[:, 3] *= 1e6
    x = jnp.asarray(np.stack([clean, railed]))

    f_ref, fl_ref = lc.logcov_features(x, base, whitener=w0, with_flags=True)
    f_fus, fl_fus = lc.logcov_features(
        x, fused_cfg, whitener=w0, with_flags=True
    )
    np.testing.assert_array_equal(np.asarray(fl_ref), np.asarray(fl_fus))
    assert np.asarray(fl_fus)[1]  # railed window still flagged
    np.testing.assert_allclose(
        np.asarray(f_fus), np.asarray(f_ref), rtol=5e-3, atol=5e-3
    )


@pytest.mark.slow
def test_fused_gradients_flow(dataset):
    """Training through the fused path: grads wrt head params are finite
    and the whitener buffer stays excluded (stop_gradient)."""
    from neural_speech_decoding_tpu.models.registry import get_model

    spec = get_model("logcov8", whiten=True, logm="chebyshev_scan",
                     spectral="matmul")
    x = np.asarray(dataset.windows[:8], np.float32)
    y = np.asarray(dataset.labels[:8], np.int32)
    params = spec.init(jax.random.PRNGKey(0))
    params = spec.fit(params, x)

    def loss(p):
        logits = spec.apply(p, x, train=False)
        return -jnp.mean(
            jnp.take_along_axis(
                jax.nn.log_softmax(logits, -1), y[:, None], axis=1
            )
        )

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["head"]["w"])).all()
    assert float(jnp.abs(g["whitener"]).max()) == 0.0


@pytest.mark.slow
def test_fused_kernel_branch_via_interpreter(dataset, monkeypatch):
    """The pallas-kernel branch of the fused path (normally TPU-only)
    runs under the interpreter and matches the einsum branch — catches
    wrapper/layout bugs before any chip sees the kernel. Also covers
    vmap over stacked members (the EnsembleEngine path)."""
    cfg = lc.LogCovConfig(whiten=True, spectral="matmul")
    w0 = _fitted(dataset, cfg)
    x = jnp.asarray(dataset.windows[48:52], jnp.float32)
    ref = np.asarray(lc._whitened_band_covariances_fused(x, cfg, w0))
    monkeypatch.setenv("NSD_BANDCOV_INTERPRET", "1")
    got = np.asarray(lc._whitened_band_covariances_fused(x, cfg, w0))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    # vmapped over a stacked member axis (2 members, different whiteners)
    w_stack = jnp.stack([w0, w0 * 1.01])
    vm = jax.vmap(
        lambda w: lc._whitened_band_covariances_fused(x, cfg, w)
    )(w_stack)
    assert np.isfinite(np.asarray(vm)).all()
    np.testing.assert_allclose(np.asarray(vm)[0], got, rtol=2e-4, atol=2e-5)


def test_band_grams_gradient_matches_einsum():
    """band_grams has a custom VJP (backward recomputes via the einsum
    reference) — whitened full-window logcov training on TPU
    differentiates through it."""
    rng = np.random.default_rng(5)
    slices, start = [], 0
    for bins in (10, 12, 15):
        slices.append(slice(start, start + 2 * bins))
        start += 2 * bins
    y = jnp.asarray(rng.standard_normal((9, start, 8)).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal((9, len(slices), 8, 8)).astype(np.float32)
    )

    def loss_kernel(v):
        return jnp.sum(band_grams(v, slices, interpret=True) * ct)

    def loss_ref(v):
        ref = jnp.stack(
            [
                jnp.einsum(
                    "brc,brd->bcd", v[:, sl], v[:, sl],
                    precision=jax.lax.Precision.HIGHEST,
                )
                for sl in slices
            ],
            axis=1,
        )
        return jnp.sum(ref * ct)

    g_kernel = np.asarray(jax.grad(loss_kernel)(y))
    g_ref = np.asarray(jax.grad(loss_ref)(y))
    scale = max(np.abs(g_ref).max(), 1.0)
    np.testing.assert_allclose(g_kernel, g_ref, atol=2e-5 * scale)
