"""Mesh/sharding tests on the 8-device virtual CPU platform."""

import jax
import numpy as np
import pytest

from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
from neural_speech_decoding_tpu.models.lstm import decoder_apply, init_decoder_params
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter
from neural_speech_decoding_tpu.parallel.mesh import make_mesh, mesh_axes
from neural_speech_decoding_tpu.parallel.sharding import (
    batch_sharding,
    shard_params_tp,
    sharded_predict_fn,
)


def test_mesh_axes():
    assert mesh_axes(8) == (4, 2)
    assert mesh_axes(1) == (1, 1)
    assert mesh_axes(8, tp=4) == (2, 4)
    with pytest.raises(ValueError):
        mesh_axes(6, tp=4)


def test_requires_8_devices():
    assert len(jax.devices()) == 8


def test_dp_sharded_predict_matches_single_device(checkpoint_path):
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params

    params = load_decoder_params(checkpoint_path)
    mesh = make_mesh(tp=1)
    filter_cfg = FilterConfig(precision="fast")
    decoder_cfg = DecoderConfig()

    def pipeline(p, w):
        filtered = jax.vmap(lambda x: mai_filter(x, filter_cfg))(w)
        return jax.nn.softmax(decoder_apply(p, filtered, decoder_cfg), axis=-1)

    rng = np.random.default_rng(0)
    windows = rng.standard_normal((16, 625, 8)).astype(np.float32)

    fn, placed = sharded_predict_fn(mesh, pipeline, params)
    sharded_out = np.asarray(fn(placed, jax.device_put(windows, batch_sharding(mesh))))
    single_out = np.asarray(jax.jit(pipeline)(params, windows))
    np.testing.assert_allclose(sharded_out, single_out, rtol=2e-4, atol=2e-5)


def test_tp_sharded_forward_matches_replicated():
    cfg = DecoderConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(tp=2)

    x = np.random.default_rng(1).standard_normal((8, 64, 8)).astype(np.float32)

    ref = np.asarray(decoder_apply(params, x, cfg))

    placed = shard_params_tp(mesh, params)
    fn = jax.jit(lambda p, w: decoder_apply(p, w, cfg))
    out = np.asarray(fn(placed, jax.device_put(x, batch_sharding(mesh))))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # gate matrices really are sharded over tp
    w_ih = placed["lstm"][0]["w_ih"]
    assert "tp" in str(w_ih.sharding.spec)


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip_entry(n):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(n)


def test_graft_entry_forward():
    import __graft_entry__

    fn, (params, windows) = __graft_entry__.entry()
    probs = np.asarray(jax.jit(fn)(params, windows))
    assert probs.shape == (8, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
