"""Chebyshev-domain spectrum guard for the logcov family.

The deployment flagship (whitened logcov8) evaluates logm as a degree-320
Chebyshev polynomial fitted on a normalized-eigenvalue interval
(models/logcov.py). Whitening voids the shrinkage floor that guarantees
that domain, and a degenerate live window pushes eigenvalues out of it,
where the polynomial silently drifts (~10 feature units for deep
degeneracy — see test_polynomial_wrong_out_of_domain_unit). These tests
pin the guard: out-of-domain windows produce BOUNDED features and a
raised flag on every backend, while in-domain windows pass through
bit-identical to the unguarded path (checkpoint parity).

Measured failure geometry on the shipped dataset (the scenarios mirror the
reference's own fault injectors, reference:
Minds_AI_Filter_Real-time_Signal_Analysis.py:141-162):

  * railed channel (x1e6 gain) under an ordinary whitener:
    lambda_min 6.0e-4 < lo=0.002            -> OUT of domain, flagged
  * flatlined channel the whitener expected to run 30x hot:
    lambda_min 3.5e-4                       -> OUT of domain, flagged
  * ordinary flatline under an ordinary whitener: lambda_min 0.011 — the
    PRE-whitening shrinkage floor survives   -> in-domain, NOT flagged
    (bounded and correct without the guard; shrinkage scales with trace,
    so trace-inflating faults self-rescue too)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoding_tpu.models import logcov as lc

HOT_GAIN = np.array([1, 1, 1, 30.0, 1, 1, 1, 1], np.float32)


def _fit(windows, cfg):
    params = lc.init_logcov_params(jax.random.PRNGKey(0), cfg)
    return lc.fit_whitener(params, windows, cfg=cfg)["whitener"]


def _scenarios(dataset, cfg):
    """Two (whitener, [in-domain window, out-of-domain window]) pairs."""
    base = np.asarray(dataset.windows[:48], np.float32)
    clean = np.asarray(dataset.windows[48], np.float32)
    railed = np.asarray(dataset.windows[49], np.float32).copy()
    railed[:, 3] *= 1e6  # amplifier railed / gain change upward
    ordinary = (_fit(base, cfg), np.stack([clean, railed]))

    hot_clean = clean * HOT_GAIN  # this session's ch3 legitimately runs hot
    flat = hot_clean.copy()
    flat[:, 3] = 0.0  # ...then the electrode falls off
    hot = (_fit(base * HOT_GAIN, cfg), np.stack([hot_clean, flat]))
    return [ordinary, hot]


@pytest.mark.parametrize("backend", ["chebyshev_scan", "eigh"])
def test_degenerate_windows_bounded_and_flagged(dataset, backend):
    cfg = lc.LogCovConfig(whiten=True, logm=backend)
    for whitener, batch in _scenarios(dataset, cfg):
        feats, flags = lc.logcov_features(
            jnp.asarray(batch), cfg, whitener=whitener, with_flags=True
        )
        feats, flags = np.asarray(feats), np.asarray(flags)
        assert np.all(np.isfinite(feats))
        # bounded: worst case is log of the trace scale (~log 1e12 for the
        # railed window), nowhere near a degree-320 extrapolation blow-up
        assert np.max(np.abs(feats)) < 1e3
        assert not flags[0], "in-domain window must not be flagged"
        assert flags[1], "out-of-domain window must be flagged"


def test_ordinary_flatline_stays_in_domain(dataset):
    """A flatline the whitener had no special expectation for is rescued
    by the pre-whitening shrinkage floor: in-domain, unflagged, and the
    polynomial agrees with the exact eigh log."""
    cfg = lc.LogCovConfig(whiten=True, logm="chebyshev_scan")
    whitener = _fit(np.asarray(dataset.windows[:48], np.float32), cfg)
    flat = np.asarray(dataset.windows[48], np.float32).copy()
    flat[:, 3] = 0.0
    feats, flags = lc.logcov_features(
        jnp.asarray(flat[None]), cfg, whitener=whitener, with_flags=True
    )
    assert not np.asarray(flags)[0]
    eigh = lc.logcov_features(
        jnp.asarray(flat[None]),
        dataclasses.replace(cfg, logm="eigh"),
        whitener=whitener,
    )
    np.testing.assert_allclose(np.asarray(feats), np.asarray(eigh), atol=2e-3)


def test_polynomial_wrong_out_of_domain_unit():
    """Why the guard exists, quantified. Trace normalization bounds the
    Chebyshev argument to x in [-1.0005, 1], so an out-of-domain
    eigenvalue never overflows — it drifts SILENTLY: the polynomial
    reports ~log(lo) ~ -6 for a deeply degenerate eigenvalue whose exact
    (clamped) log is -16, a ~10-unit feature error with no warning. The
    guard converts that silent drift into a flag plus a stable clamp."""
    cfg = lc.LogCovConfig(logm="chebyshev_scan", guard_domain=False)
    c = cfg.num_channels
    # diag matrix, one eigenvalue far below the domain floor
    s = np.diag([1e-7] + [1.0] * (c - 1)).astype(np.float32)
    poly = np.asarray(lc._logm_spd_chebyshev(jnp.asarray(s[None]), cfg))[0]
    w, v = np.linalg.eigh(s)
    exact = (v * np.log(np.maximum(w, 1e-12))) @ v.T
    err = np.abs(poly - exact).max()
    assert np.isfinite(poly).all()
    assert err > 5.0, f"expected silent out-of-domain drift, got {err}"
    # ...and the guard removes it: the clamped matrix is in-domain, where
    # the polynomial is ~1e-4-exact
    guarded, bad = lc.guard_spectrum(jnp.asarray(s[None, None]), cfg)
    assert np.asarray(bad)[0, 0]
    g = np.asarray(guarded)[0, 0]
    gpoly = np.asarray(lc._logm_spd_chebyshev(jnp.asarray(g[None]), cfg))[0]
    wg, vg = np.linalg.eigh(g)
    gexact = (vg * np.log(wg)) @ vg.T
    assert np.abs(gpoly - gexact).max() < 1e-3


def test_guard_changes_only_flagged_windows(dataset):
    """On the dataset scenarios: the guard leaves the in-domain window
    bit-identical and rewrites the flagged one."""
    cfg = lc.LogCovConfig(whiten=True, logm="chebyshev_scan")
    cfg_off = dataclasses.replace(cfg, guard_domain=False)
    for whitener, batch in _scenarios(dataset, cfg):
        on, flags = lc.logcov_features(
            jnp.asarray(batch), cfg, whitener=whitener, with_flags=True
        )
        off = lc.logcov_features(jnp.asarray(batch), cfg_off, whitener=whitener)
        on, off, flags = np.asarray(on), np.asarray(off), np.asarray(flags)
        assert not flags[0] and flags[1]
        np.testing.assert_array_equal(on[0], off[0])
        assert np.abs(on[1] - off[1]).max() > 0.0


def test_guard_preserves_clean_windows(dataset):
    """In-domain windows pass through the guard bit-identical — whitened
    checkpoints trained before the guard keep decoding identically."""
    cfg = lc.LogCovConfig(whiten=True, logm="chebyshev_scan")
    cfg_off = dataclasses.replace(cfg, guard_domain=False)
    w = _fit(np.asarray(dataset.windows[:48], np.float32), cfg)
    x = jnp.asarray(dataset.windows[50:66])
    on, flags = lc.logcov_features(x, cfg, whitener=w, with_flags=True)
    off = lc.logcov_features(x, cfg_off, whitener=w)
    assert not np.asarray(flags).any()
    np.testing.assert_array_equal(np.asarray(on), np.asarray(off))


def test_guard_spectrum_unit():
    """Exact detector on matrices with known spectra."""
    cfg = lc.LogCovConfig()
    lo, hi = cfg.cheb_interval
    c = cfg.num_channels
    good = np.diag(np.linspace(0.5, 2.0, c)).astype(np.float32)
    low = np.diag([1e-5] + [1.0] * (c - 1)).astype(np.float32)
    s = jnp.asarray(np.stack([good, low])[None])  # [1, 2, C, C]
    guarded, bad = lc.guard_spectrum(s, cfg)
    bad = np.asarray(bad)[0]
    assert not bad[0] and bad[1]
    np.testing.assert_array_equal(np.asarray(guarded)[0, 0], good)
    # the clamped matrix's normalized spectrum is inside [lo, hi]
    g = np.asarray(guarded)[0, 1]
    w = np.linalg.eigvalsh(g / (np.trace(g) / c))
    assert w.min() >= lo and w.max() <= hi


def test_custom_interval_upper_edge():
    """hi < C engages the mirror Cholesky test and a stronger clamp."""
    cfg = lc.LogCovConfig(cheb_interval=(0.002, 4.0))
    c = cfg.num_channels
    spike = np.diag([6.0] + [2.0 / (c - 1)] * (c - 1)).astype(np.float32)
    s = jnp.asarray(spike[None, None])
    guarded, bad = lc.guard_spectrum(s, cfg)
    assert np.asarray(bad)[0, 0]
    g = np.asarray(guarded)[0, 0]
    w = np.linalg.eigvalsh(g / (np.trace(g) / c))
    assert w.min() >= cfg.cheb_interval[0] and w.max() <= cfg.cheb_interval[1]


def test_engine_surfaces_guard_counter(dataset):
    """The serving engine counts clamped windows in .stats — degraded
    electrodes are detected, not silently decoded."""
    from neural_speech_decoding_tpu.config import FilterConfig
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    # the engine MAI-filters before logcov, and MAI's channel mixing
    # spreads a railed channel across all channels (trace-inflating, which
    # the shrinkage floor self-rescues) — so the engine-level fault that
    # reaches the guard is the hot-channel flatline: whitener fitted while
    # ch3 ran 30x hot, electrode then falls off
    spec = get_model("logcov8", whiten=True, logm="chebyshev_scan")
    fcfg = FilterConfig(precision="fast")
    hot = np.asarray(dataset.windows[:48], np.float32) * HOT_GAIN
    filtered = np.asarray(mai_filter_batch(hot, fcfg))
    params = spec.init(jax.random.PRNGKey(0))
    params = spec.fit(params, filtered)
    engine = InferenceEngine(
        params=params, model="logcov8",
        model_kw={"whiten": True, "logm": "chebyshev_scan"},
    )
    clean = np.asarray(dataset.windows[48], np.float32) * HOT_GAIN
    flat = clean.copy()
    flat[:, 3] = 0.0
    batch = np.stack([clean, flat])
    probs = engine.predict_batch(batch)
    assert np.all(np.isfinite(probs))
    stats = engine.stats
    assert stats["windows"] == 2
    assert stats["guard_flagged"] == 1

    # async path parks flags and folds them on the next stats read
    engine.predict_batch_async(jnp.asarray(batch))
    assert engine.stats["windows"] == 4
    assert engine.stats["guard_flagged"] == 2


def test_pd_mask_matches_eigvalsh():
    """The unrolled Sylvester test agrees with an eigensolver across a
    spread of random matrices straddling definiteness."""
    rng = np.random.default_rng(0)
    c = 8
    a = rng.standard_normal((256, c, c)).astype(np.float32)
    spd = a @ np.swapaxes(a, -1, -2) / c  # PSD, occasionally near-singular
    shift = rng.uniform(-0.5, 0.5, size=(256, 1, 1)).astype(np.float32)
    m = spd - shift * np.eye(c, dtype=np.float32)
    got = np.asarray(lc._pd_mask(jnp.asarray(m)))
    truth = np.linalg.eigvalsh(m.astype(np.float64))[:, 0] > 0
    # agree except within fp noise of exact singularity
    margin = np.abs(np.linalg.eigvalsh(m.astype(np.float64))[:, 0]) > 1e-5
    assert (got == truth)[margin].all()
    assert margin.mean() > 0.95  # the comparison actually covered cases
