"""shard_map collective tests on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration-grade; full suite only

from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
from neural_speech_decoding_tpu.models.lstm import decoder_apply
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
from neural_speech_decoding_tpu.parallel.collective import (
    all_gather_probs,
    sharded_eval,
)
from neural_speech_decoding_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def setup(checkpoint_path, dataset):
    params = load_decoder_params(checkpoint_path)
    filtered = np.asarray(
        mai_filter_batch(dataset.windows[:24], FilterConfig(precision="fast"))
    )
    labels = dataset.labels[:24]
    cfg = DecoderConfig()
    apply_fn = lambda p, x: decoder_apply(p, x, cfg)  # noqa: E731
    return params, filtered, labels, apply_fn


def test_sharded_eval_matches_local(setup):
    params, filtered, labels, apply_fn = setup
    mesh = make_mesh(tp=2)  # dp=4, tp=2
    acc, total = sharded_eval(mesh, apply_fn, params, filtered, labels)
    assert total == 24
    local = np.asarray(jax.jit(apply_fn)(params, filtered)).argmax(1)
    expected = float((local == labels).mean())
    assert abs(acc - expected) < 1e-6


def test_sharded_eval_pads_uneven(setup):
    params, filtered, labels, apply_fn = setup
    mesh = make_mesh(tp=1)  # dp=8
    acc, total = sharded_eval(mesh, apply_fn, params, filtered[:21], labels[:21])
    assert total == 21  # padding rows excluded from counts


def test_all_gather_probs(setup):
    params, filtered, labels, apply_fn = setup
    mesh = make_mesh(tp=2)
    probs_fn = lambda p, x: jax.nn.softmax(apply_fn(p, x), -1)  # noqa: E731
    probs = all_gather_probs(mesh, probs_fn, params, filtered)
    assert probs.shape == (24, 3)
    local = np.asarray(jax.jit(probs_fn)(params, filtered))
    np.testing.assert_allclose(probs, local, rtol=2e-4, atol=2e-5)
    with pytest.raises(ValueError, match="divisible"):
        all_gather_probs(mesh, probs_fn, params, filtered[:7])
