"""Model family tests: registry, EEGNet, transformer, params persistence."""

import jax
import numpy as np
import pytest

from neural_speech_decoding_tpu.io.params_io import load_params_npz, save_params_npz
from neural_speech_decoding_tpu.models.registry import available_models, get_model


@pytest.fixture
def windows():
    rng = np.random.default_rng(0)
    return rng.standard_normal((4, 625, 8)).astype(np.float32)


def test_logcov_spectral_paths_agree(windows):
    """The stacked cos/sin band-projection matmul computes the same band
    covariances (and features) as the rfft + Parseval path."""
    from neural_speech_decoding_tpu.models.logcov import (
        LogCovConfig,
        band_covariances,
        logcov_features,
    )

    cfg_f = LogCovConfig(spectral="fft")
    cfg_m = LogCovConfig(spectral="matmul")
    a = np.asarray(band_covariances(windows, cfg_f))
    b = np.asarray(band_covariances(windows, cfg_m))
    np.testing.assert_allclose(a, b, atol=1e-5)
    fa = np.asarray(logcov_features(windows, cfg_f))
    fb = np.asarray(logcov_features(windows, cfg_m))
    np.testing.assert_allclose(fa, fb, atol=1e-4)


def test_logcov_band_cov_is_parseval_cov(windows):
    """Full-support band covariance == time-domain covariance (Parseval)."""
    from neural_speech_decoding_tpu.models.logcov import (
        LogCovConfig,
        band_covariances,
    )

    # shrinkage 0 needs the exact-eigh backend (the polynomial logm's
    # config validation enforces its eigenvalue floor); band_covariances
    # itself is logm-agnostic
    cfg = LogCovConfig(bands=((0.0, 63.0),), shrinkage=0.0, logm="eigh")
    s = np.asarray(band_covariances(windows, cfg))[:, 0]
    for i, w in enumerate(windows):
        xc = w - w.mean(0)
        np.testing.assert_allclose(s[i], (xc.T @ xc) / w.shape[0], atol=1e-5)


@pytest.mark.parametrize("name", ["lstm", "lstm5", "eegnet", "transformer", "tcn"])
def test_model_forward_shapes(name, windows):
    spec = get_model(name)
    params = spec.init(jax.random.PRNGKey(0))
    logits = np.asarray(spec.apply(params, windows))
    assert logits.shape == (4, len(spec.class_names))
    assert np.isfinite(logits).all()
    # train mode runs and is stochastic for dropout models
    a = np.asarray(spec.apply(params, windows, train=True, rng=jax.random.PRNGKey(1)))
    b = np.asarray(spec.apply(params, windows, train=True, rng=jax.random.PRNGKey(2)))
    assert a.shape == logits.shape
    assert np.abs(a - b).max() > 0


def test_registry_unknown():
    with pytest.raises(KeyError, match="unknown model"):
        get_model("mamba")
    assert "lstm" in available_models()


@pytest.mark.parametrize("name", ["eegnet", "transformer", "tcn", "lru"])
def test_models_jit_and_grad(name, windows):
    spec = get_model(name)
    params = spec.init(jax.random.PRNGKey(0))
    y = np.array([0, 1, 2, 0], dtype=np.int32)

    def loss(p):
        logits = spec.apply(p, windows, train=True, rng=jax.random.PRNGKey(3))
        return -jax.numpy.mean(
            jax.numpy.take_along_axis(
                jax.nn.log_softmax(logits, -1), y[:, None], axis=1
            )
        )

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)


def test_train_registry_model_smoke(dataset):
    """EEGNet trains through the generic loop."""
    from neural_speech_decoding_tpu.train.loop import TrainConfig, train

    sub = dataset._take(np.arange(0, len(dataset), 6))
    params, history = train(
        sub,
        model="eegnet",
        train_cfg=TrainConfig(epochs=2, batch_size=8),
        verbose=False,
    )
    assert np.isfinite(history[-1]["train_loss"])


def test_params_npz_roundtrip(tmp_path):
    spec = get_model("transformer")
    params = spec.init(jax.random.PRNGKey(0))
    path = tmp_path / "ckpt.npz"
    save_params_npz(path, params)
    back = load_params_npz(path)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                  sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


def test_npz_checkpoint_through_engine(tmp_path, windows):
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    spec = get_model("eegnet")
    params = spec.init(jax.random.PRNGKey(0))
    path = tmp_path / "eegnet.npz"
    save_params_npz(path, params)

    eng = InferenceEngine(str(path), model="eegnet")
    probs, label = eng.predict(windows[0])
    assert probs.shape == (3,)
    assert label in spec.class_names
    # .pth + non-lstm family must be rejected
    with pytest.raises(ValueError, match="LSTM-family"):
        InferenceEngine("whatever.pth", model="eegnet")


def test_get_model_config_overrides(windows):
    """get_model(name, **kw) overrides config fields (sweepable via
    tools/crossval.py --model-kw); lists freeze to tuples for hashability."""
    spec = get_model("logcov8", shrinkage=0.2, dropout=0.0)
    assert spec.config.shrinkage == 0.2
    assert spec.config.dropout == 0.0
    assert len(spec.config.bands) == 8  # entry default survives

    # JSON-decoded band edges (lists) become tuples -> config stays hashable
    spec2 = get_model("logcov", bands=[[3.0, 10.0], [10.0, 48.0]])
    assert spec2.config.bands == ((3.0, 10.0), (10.0, 48.0))
    hash(spec2.config)
    logits = spec2.apply(spec2.init(jax.random.PRNGKey(0)), windows[:2])
    assert logits.shape == (2, 3)

    with pytest.raises(TypeError):
        get_model("logcov8", not_a_field=1)


def test_logcov12_multiresolution_bands(windows):
    """logcov12 = the 4 broad rhythms + 8 narrow slices (432 features)."""
    spec = get_model("logcov12")
    assert len(spec.config.bands) == 12
    params = spec.init(jax.random.PRNGKey(0))
    assert params["head"]["w"].shape == (12 * 36, 3)
    logits = spec.apply(params, windows[:3])
    assert logits.shape == (3, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_logcov12_5_multiresolution_bands(windows):
    """logcov12_5 = the 12-band multi-resolution view on 5 classes."""
    spec = get_model("logcov12_5")
    assert len(spec.config.bands) == 12
    assert len(spec.class_names) == 5
    params = spec.init(jax.random.PRNGKey(0))
    assert params["head"]["w"].shape == (12 * 36, 5)
    logits = spec.apply(params, windows[:3])
    assert logits.shape == (3, 5)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_logcov_whitening_fit_hook(windows):
    """whiten=True: ModelSpec.fit computes the per-band tangent-point
    whitener G^-1/2; features on the fitting data become near-centered and
    the buffer takes no gradient (stop_gradient)."""
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.models.logcov import logcov_features

    spec = get_model("logcov", whiten=True)
    assert spec.fit is not None
    assert get_model("logcov").fit is None  # default stays fit-free

    x = np.asarray(windows[:16], np.float32)
    p0 = spec.init(jax.random.PRNGKey(0))
    nb = len(spec.config.bands)
    np.testing.assert_array_equal(
        np.asarray(p0["whitener"]), np.broadcast_to(np.eye(8), (nb, 8, 8))
    )
    p1 = spec.fit(p0, x, None)

    f_id = np.asarray(logcov_features(x, spec.config))
    f_wh = np.asarray(logcov_features(x, spec.config, whitener=p1["whitener"]))
    assert np.abs(f_wh.mean(0)).mean() < 0.2 * np.abs(f_id.mean(0)).mean()

    g = jax.grad(lambda p: jnp.sum(spec.apply(p, x[:4]) ** 2))(p1)
    assert float(jnp.abs(g["whitener"]).max()) == 0.0
    assert float(jnp.abs(g["head"]["w"]).max()) > 0.0

    # identity whitener == no whitener (exactly the unwhitened features)
    np.testing.assert_allclose(
        np.asarray(logcov_features(x, spec.config, whitener=p0["whitener"])),
        f_id, rtol=2e-4, atol=2e-5,
    )


def test_logcov_whiten_trains_and_roundtrips(tmp_path, windows):
    """Whitened logcov trains through the standard loop (fit hook runs) and
    the whitener survives an npz round-trip into the engine."""
    from neural_speech_decoding_tpu.io.params_io import (
        load_params_npz,
        save_params_npz,
    )

    spec = get_model("logcov", whiten=True)
    params = spec.fit(spec.init(jax.random.PRNGKey(0)), windows[:16], None)
    path = tmp_path / "wh.npz"
    save_params_npz(path, params)
    back = load_params_npz(path)
    np.testing.assert_array_equal(
        np.asarray(params["whitener"]), np.asarray(back["whitener"])
    )
    logits = spec.apply(back, windows[:2])
    assert logits.shape == (2, 3)


def test_whitened_checkpoint_serves_without_model_kw(windows):
    """Whitening keys off the checkpoint: a params pytree with a fitted
    whitener decodes identically under the DEFAULT config (no model_kw) —
    a whitened deployment artifact can never be silently served against
    the wrong tangent point."""
    spec_w = get_model("logcov", whiten=True)
    params = spec_w.fit(spec_w.init(jax.random.PRNGKey(0)), windows[:16], None)
    with_kw = np.asarray(spec_w.apply(params, windows[:4]))
    plain = np.asarray(get_model("logcov").apply(params, windows[:4]))
    np.testing.assert_allclose(plain, with_kw, atol=1e-6)


@pytest.mark.parametrize("impl", ["associative", "chunked"])
def test_lru_scan_matches_sequential(windows, impl):
    """Both state engines (associative scan and the chunked kernel-matmul
    path) equal the sequential recurrence h_t = lam*h_{t-1} + gamma*B x_t
    they parallelize."""
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.models import lru as m

    cfg = m.LRUConfig(hidden=16, scan_impl=impl)
    params = m.init_lru_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.asarray(windows)[:2, :50], jnp.float32)
    h = np.asarray(m._lru_states(params, x, cfg))

    lam = np.exp(-np.exp(np.asarray(params["nu"]))
                 + 1j * np.exp(np.asarray(params["theta"])))
    gamma = np.sqrt(np.maximum(1.0 - np.abs(lam) ** 2, 1e-6))
    b = np.asarray(params["b_re"]) + 1j * np.asarray(params["b_im"])
    u = np.einsum("btc,ch->bth", np.asarray(x), b) * gamma
    ref = np.zeros_like(u)
    state = np.zeros((u.shape[0], u.shape[2]), np.complex128)
    for t in range(u.shape[1]):
        state = lam * state + u[:, t]
        ref[:, t] = state
    np.testing.assert_allclose(h, ref.astype(np.complex64), rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_lru_chunked_matches_associative_full_window(windows):
    """Full reference geometry (T=625 -> chunk 125 x 5): logits from the
    chunked engine match the associative engine, and gradients through the
    chunked kernel are finite (the masked-exp construction must not leak
    NaNs from the discarded triangle)."""
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.models import lru as m

    params = m.init_lru_params(jax.random.PRNGKey(2), m.LRUConfig())
    x = jnp.asarray(np.asarray(windows)[:4], jnp.float32)
    la = np.asarray(
        m.lru_apply(params, x, m.LRUConfig(scan_impl="associative"))
    )
    lc = np.asarray(m.lru_apply(params, x, m.LRUConfig(scan_impl="chunked")))
    np.testing.assert_allclose(lc, la, rtol=2e-4, atol=2e-4)

    cfg = m.LRUConfig(scan_impl="chunked")

    def loss(p):
        return jnp.sum(m.lru_apply(p, x, cfg) ** 2)

    g = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_lru_stability_and_shapes(windows):
    from neural_speech_decoding_tpu.models import lru as m

    cfg = m.LRUConfig()
    params = m.init_lru_params(jax.random.PRNGKey(1), cfg)
    lam_mod = np.exp(-np.exp(np.asarray(params["nu"])))
    assert (lam_mod < 1.0).all() and (lam_mod > 0.3).all()
    logits = np.asarray(m.lru_apply(params, windows, cfg))
    assert logits.shape == (windows.shape[0], 3)
    assert np.isfinite(logits).all()


def test_logm_rational_more_accurate_than_chebyshev():
    """The round-4 serving default logm='rational' (resolvent
    partial-fraction sum, models/logcov._logm_spd_rational) must beat the
    degree-320 Chebyshev it replaced against an f64 eigh ground truth on
    SPD matrices spanning the fit interval — the accuracy claim that
    justifies the flip (measured 2.99e-6 vs 1.14e-5 on the shipped
    dataset's whitened band covariances)."""
    import dataclasses

    import jax.numpy as jnp

    from neural_speech_decoding_tpu.models import logcov as lc

    cfg = lc.LogCovConfig()
    lo, hi = cfg.cheb_interval
    rng = np.random.default_rng(7)
    # random SPD with eigenvalues log-spread across [2*lo, hi/1.5],
    # trace-normalized inside _logm_spd_* like the serving path
    q, _ = np.linalg.qr(rng.standard_normal((48, 8, 8)))
    lam = np.exp(
        rng.uniform(np.log(2 * lo), np.log(hi / 1.5), size=(48, 8))
    )
    s = np.einsum("bik,bk,bjk->bij", q, lam, q)
    s64 = jnp.asarray(s, jnp.float64)
    w, v = np.linalg.eigh(s)
    gt = np.einsum("bik,bk,bjk->bij", v, np.log(w), v)

    r = np.asarray(lc._logm_spd_rational(jnp.asarray(s, jnp.float32), cfg))
    c = np.asarray(
        lc._logm_spd_chebyshev(
            jnp.asarray(s, jnp.float32),
            dataclasses.replace(cfg, logm="chebyshev"),
        )
    )
    err_r = np.abs(r - gt).max()
    err_c = np.abs(c - gt).max()
    assert err_r < 5e-5, err_r
    assert err_r <= err_c * 1.5, (err_r, err_c)  # never meaningfully worse
    # f64 evaluation isolates the fit error itself from f32 rounding
    r64 = np.asarray(lc._logm_spd_rational(s64, cfg))
    assert np.abs(r64 - gt).max() < 1e-5


def test_logcov_featurize_head_split_matches_apply(windows):
    """ModelSpec.featurize/head_apply compose to exactly apply — the
    contract crossval's feature-space fast path relies on."""
    spec = get_model("logcov8", whiten=True, logm="chebyshev_scan")
    params = spec.init(jax.random.PRNGKey(0))
    params = spec.fit(params, np.asarray(windows))
    full = np.asarray(spec.apply(params, windows, train=False))
    split = np.asarray(
        spec.head_apply(params, spec.featurize(params, windows), train=False)
    )
    np.testing.assert_allclose(split, full, rtol=1e-6, atol=1e-6)
    # train-mode dropout path too (same rng -> same mask)
    a = np.asarray(
        spec.apply(params, windows, train=True, rng=jax.random.PRNGKey(5))
    )
    b = np.asarray(
        spec.head_apply(
            params, spec.featurize(params, windows), train=True,
            rng=jax.random.PRNGKey(5),
        )
    )
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6)
