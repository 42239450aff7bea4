"""Pallas LSTM kernel numerics (interpret mode on CPU; real TPU in bench)."""

import jax
import numpy as np
import pytest

from neural_speech_decoding_tpu.config import DecoderConfig
from neural_speech_decoding_tpu.models.lstm import (
    _lstm_layer,
    decoder_logits,
    init_decoder_params,
)
from neural_speech_decoding_tpu.ops.pallas.lstm import (
    decoder_apply_pallas,
    lstm_layer_pallas,
)


@pytest.fixture(scope="module")
def params():
    return init_decoder_params(jax.random.PRNGKey(0), DecoderConfig())


def test_layer_matches_scan(params):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 250, 8)).astype(np.float32)
    layer = params["lstm"][0]
    ref = np.asarray(_lstm_layer(layer, x, jax.lax.Precision.HIGHEST))
    xt = np.transpose(x, (1, 0, 2))
    ours = np.asarray(
        lstm_layer_pallas(
            xt, layer["w_ih"], layer["w_hh"], layer["b"],
            block_b=4, block_t=125, interpret=True,
        )
    )
    np.testing.assert_allclose(np.transpose(ours, (1, 0, 2)), ref, rtol=2e-5, atol=2e-6)


def test_layer_chunked_carry(params):
    """State must carry across time chunks (grid dim 1)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 250, 8)).astype(np.float32)
    layer = params["lstm"][0]
    xt = np.transpose(x, (1, 0, 2))
    one_chunk = np.asarray(
        lstm_layer_pallas(xt, layer["w_ih"], layer["w_hh"], layer["b"],
                          block_b=2, block_t=250, interpret=True)
    )
    five_chunks = np.asarray(
        lstm_layer_pallas(xt, layer["w_ih"], layer["w_hh"], layer["b"],
                          block_b=2, block_t=50, interpret=True)
    )
    np.testing.assert_allclose(five_chunks, one_chunk, rtol=1e-5, atol=1e-6)


def test_full_decoder_matches_xla(params, checkpoint_path):
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params

    real = load_decoder_params(checkpoint_path)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 625, 8)).astype(np.float32)
    ref = np.asarray(decoder_logits(real, x))
    ours = np.asarray(decoder_apply_pallas(real, x, block_b=2, block_t=125, interpret=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_bad_block_t_raises(params):
    layer = params["lstm"][0]
    x = np.zeros((250, 2, 8), np.float32)
    with pytest.raises(ValueError, match="block_t"):
        lstm_layer_pallas(x, layer["w_ih"], layer["w_hh"], layer["b"],
                          block_t=123, interpret=True)


def test_two_layer_fused_kernel_matches_scan(params):
    """The fused two-layer kernel (round 4) matches the XLA scan path in
    both gate-math modes, and its state carries across time chunks."""
    from neural_speech_decoding_tpu.ops.pallas.lstm import (
        lstm_two_layer_pallas,
    )

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 250, 8)).astype(np.float32)
    xt = np.transpose(x, (1, 0, 2))
    l1, l2 = params["lstm"]
    for gm in ("builtin", "rational"):
        ref = _lstm_layer(
            l2,
            np.asarray(
                _lstm_layer(l1, x, jax.lax.Precision.HIGHEST, gate_math=gm)
            ),
            jax.lax.Precision.HIGHEST,
            gate_math=gm,
        )
        ours = np.asarray(
            lstm_two_layer_pallas(
                xt, l1, l2, block_b=2, block_t=50, interpret=True,
                gate_math=gm,
            )
        )
        np.testing.assert_allclose(
            np.transpose(ours, (1, 0, 2)), np.asarray(ref),
            rtol=2e-5, atol=2e-6, err_msg=gm,
        )
    one_chunk = np.asarray(
        lstm_two_layer_pallas(xt, l1, l2, block_b=2, block_t=250,
                              interpret=True)
    )
    five_chunks = np.asarray(
        lstm_two_layer_pallas(xt, l1, l2, block_b=2, block_t=50,
                              interpret=True)
    )
    np.testing.assert_allclose(five_chunks, one_chunk, rtol=1e-5, atol=1e-6)
