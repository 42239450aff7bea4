"""Fused whitened-logcov feature kernel (ops/pallas/logmfeats.py +
models/logcov._fused_kernel_feats), interpret mode on CPU.

The kernel fuses shrinkage -> spectrum guard -> Chebyshev-Clenshaw logm
-> weighted triu extraction in the band-gram pair-rows layout, so its
features and guard flags must match the round-3 stages path
(_whitened_band_covariances_fused -> guard_spectrum ->
_logm_spd_chebyshev -> triu) to fp noise, and its gradients must match
exactly (the custom VJP recomputes through the stages path).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoding_tpu.models import logcov as lc
from neural_speech_decoding_tpu.models.registry import get_model


@pytest.fixture(autouse=True)
def _interp_env(monkeypatch):
    monkeypatch.setenv("NSD_FUSED_INTERPRET", "1")


@pytest.fixture()
def fitted(dataset):
    spec = get_model("logcov8", whiten=True)
    cfg = spec.config
    params = spec.fit(
        spec.init(jax.random.PRNGKey(0)), jnp.asarray(dataset.windows[:48])
    )
    return cfg, params["whitener"]


def _paths(cfg):
    return (
        dataclasses.replace(cfg, fused="stages"),
        dataclasses.replace(cfg, fused="kernel"),
    )


@pytest.mark.parametrize("logm", ["rational", "chebyshev"])
def test_features_and_flags_match_stages(fitted, dataset, logm):
    cfg, w0 = fitted
    cfg_st, cfg_kn = _paths(dataclasses.replace(cfg, logm=logm))
    x = np.array(dataset.windows[50:57], np.float32)
    # one railed channel and one near-flatline vs the whitener fitted on
    # clean shipped data — the guard-firing failure classes
    x[0, :, 2] *= 1e6
    x[3, :, 5] = 0.002 * np.sin(np.arange(625, dtype=np.float32) * 0.3)
    f_st, fl_st = lc.logcov_features(
        jnp.asarray(x), cfg_st, w0, with_flags=True
    )
    f_kn, fl_kn = lc.logcov_features(
        jnp.asarray(x), cfg_kn, w0, with_flags=True
    )
    f_st, fl_st, f_kn, fl_kn = map(np.asarray, (f_st, fl_st, f_kn, fl_kn))
    assert f_kn.shape == f_st.shape
    np.testing.assert_array_equal(fl_kn, fl_st)
    assert fl_kn[0], "railed channel must be flagged by both paths"
    scale = np.abs(f_st).max()
    np.testing.assert_allclose(f_kn, f_st, atol=5e-5 * max(scale, 1.0))


@pytest.mark.parametrize("logm", ["rational", "chebyshev"])
def test_gradient_matches_stages_exactly(fitted, logm):
    cfg, w0 = fitted
    cfg_st, cfg_kn = _paths(dataclasses.replace(cfg, logm=logm))
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 625, 8)).astype(np.float32))
    ct = jnp.asarray(
        rng.standard_normal((4, lc._num_features(cfg))).astype(np.float32)
    )

    def loss(cfg_v):
        return lambda v: jnp.sum(lc.logcov_features(v, cfg_v, w0) * ct)

    g_st = np.asarray(jax.grad(loss(cfg_st))(x))
    g_kn = np.asarray(jax.grad(loss(cfg_kn))(x))
    # the custom VJP recomputes THROUGH the stages path — identical
    np.testing.assert_array_equal(g_kn, g_st)


def test_kernel_path_requires_guard_and_chebyshev(fitted):
    """The fused branch only covers the flagship configuration; other
    configs must fall back to the stages path (same results by
    construction — just verify they run and agree with themselves)."""
    cfg, w0 = fitted
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, 625, 8)).astype(np.float32))
    for kw in ({"guard_domain": False}, {"logm": "chebyshev_scan"}):
        cfg_v = dataclasses.replace(cfg, fused="kernel", **kw)
        f = np.asarray(lc.logcov_features(x, cfg_v, w0))
        assert f.shape == (3, lc._num_features(cfg))
        assert np.isfinite(f).all()


@pytest.mark.slow
def test_deployed_manifest_argmax_parity(dataset):
    """The fused kernel must not change a single argmax of the deployed
    whitened ensemble on shipped trials."""
    import json
    from pathlib import Path

    man = Path("checkpoints/logcov8wd_ens_manifest.json")
    if not man.is_file():
        pytest.skip("deployed manifest not present")
    from neural_speech_decoding_tpu.io.params_io import load_params_npz

    member = json.loads(man.read_text())["members"][0]
    params = load_params_npz(member)
    spec = get_model("logcov8", whiten=True, dropout=0.0)
    cfg = spec.config
    cfg_st, cfg_kn = _paths(cfg)
    x = jnp.asarray(dataset.windows[:64])
    w0 = params["whitener"]
    f_st = lc.logcov_features(x, cfg_st, w0)
    f_kn = lc.logcov_features(x, cfg_kn, w0)
    l_st = lc.logcov_head_apply(params, f_st, cfg=cfg_st)
    l_kn = lc.logcov_head_apply(params, f_kn, cfg=cfg_kn)
    assert (
        np.asarray(jnp.argmax(l_st, -1)) == np.asarray(jnp.argmax(l_kn, -1))
    ).all()


def test_custom_hi_upper_edge_flags_match_stages(dataset):
    """With a custom cheb_interval hi < C, trace normalization no longer
    bounds lambda_max inside the domain — the stages path runs a mirror
    Sylvester test (hi*I - A PD) and the fused kernel must too. A window
    dominated by one high-variance channel (lambda_max_norm ~ 5.6 > hi=4,
    lambda_min well above lo) exercises EXACTLY the upper edge: without
    the kernel's mirror test it would pass unflagged and the degree-N
    polynomial would extrapolate past hi."""
    cfg = dataclasses.replace(
        get_model("logcov8", whiten=True).config, cheb_interval=(0.002, 4.0)
    )
    cfg_st, cfg_kn = _paths(cfg)
    nb, c = len(cfg.bands), cfg.num_channels
    w0 = jnp.broadcast_to(jnp.eye(c, dtype=jnp.float32), (nb, c, c))
    rng = np.random.default_rng(5)
    x = rng.standard_normal((6, 625, c)).astype(np.float32)
    x[0, :, 3] *= 4.0  # 16x variance channel: upper-edge violation
    x[4, :, 6] *= 4.0
    f_st, fl_st = lc.logcov_features(
        jnp.asarray(x), cfg_st, w0, with_flags=True
    )
    f_kn, fl_kn = lc.logcov_features(
        jnp.asarray(x), cfg_kn, w0, with_flags=True
    )
    f_st, fl_st, f_kn, fl_kn = map(np.asarray, (f_st, fl_st, f_kn, fl_kn))
    np.testing.assert_array_equal(fl_kn, fl_st)
    assert fl_kn[0] and fl_kn[4], "upper-edge windows must be flagged"
    assert not fl_kn[1], "plain white-noise window stays in domain"
    scale = np.abs(f_st).max()
    np.testing.assert_allclose(f_kn, f_st, atol=5e-5 * max(scale, 1.0))
