"""InferenceEngine unit tests (bucketing, async dispatch, quirks)."""

import numpy as np
import pytest

from neural_speech_decoding_tpu.runtime.engine import InferenceEngine, _bucket


def test_bucket_rounding():
    assert _bucket(1) == 1
    assert _bucket(2) == 2
    assert _bucket(3) == 4
    assert _bucket(5) == 8
    assert _bucket(8) == 8
    assert _bucket(1000) == 1024


@pytest.fixture(scope="module")
def engine(checkpoint_path):
    eng = InferenceEngine(str(checkpoint_path))
    eng.warmup([1])
    return eng


def test_padded_batch_matches_exact(engine, dataset):
    w = dataset.windows[:5]  # pads to bucket 8
    padded = engine.predict_batch(w)
    exact = engine.predict_batch(dataset.windows[:8])[:5]
    np.testing.assert_allclose(padded, exact, atol=1e-6)
    assert padded.shape == (5, 3)


def test_predict_single_contract(engine, dataset, golden):
    from conftest import golden_rows

    probs, label = engine.predict(dataset.windows[0])
    assert probs.dtype == np.float32
    row = golden_rows(golden, dataset.files[:1])[0]
    np.testing.assert_allclose(probs, golden["probs"][row], atol=1e-4)
    assert label in engine.class_names


def test_async_future_matches_sync(engine, dataset):
    import jax.numpy as jnp

    w = jnp.asarray(dataset.windows[:2])
    fut = engine.predict_batch_async(w)
    sync = engine.predict_batch(dataset.windows[:2])
    np.testing.assert_allclose(np.asarray(fut), sync, atol=1e-6)


def test_sample_rate_quirk(checkpoint_path):
    """The engine adopts the stream's sr (reference tester.py:70-75)."""
    eng = InferenceEngine(str(checkpoint_path), sample_rate=250)
    assert eng.config.sample_rate == 250
    assert eng.config.window_samples == 1250


def test_needs_model_or_params():
    with pytest.raises(ValueError, match="model_path or params"):
        InferenceEngine()


def test_turbo_mode_argmax_agreement(checkpoint_path, dataset):
    """bf16 recurrence keeps predictions aligned with f32 on real data."""
    base = InferenceEngine(str(checkpoint_path))
    turbo = InferenceEngine(str(checkpoint_path), turbo=True)
    a = base.predict_batch(dataset.windows[:32]).argmax(1)
    b = turbo.predict_batch(dataset.windows[:32]).argmax(1)
    assert (a == b).mean() >= 0.9


def test_empty_batch(engine):
    out = engine.predict_batch(np.zeros((0, 625, 8), np.float32))
    assert out.shape == (0, 3)


def test_engine_model_kw_override(tmp_path, dataset):
    """InferenceEngine(model_kw=...) serves a non-default config (here a
    whitened logcov) whose params would mismatch the registry default."""
    import jax

    from neural_speech_decoding_tpu.io.params_io import save_params_npz
    from neural_speech_decoding_tpu.models.registry import get_model

    spec = get_model("logcov", whiten=True)
    params = spec.fit(
        spec.init(jax.random.PRNGKey(0)), dataset.windows[:16], None
    )
    path = tmp_path / "wh.npz"
    save_params_npz(path, params)
    eng = InferenceEngine(str(path), model="logcov", model_kw={"whiten": True})
    probs, label = eng.predict(dataset.windows[0])
    assert probs.shape == (3,)
    assert label in eng.class_names
