"""Accuracy of the rational gate activations (ops/gates.py).

These bounds are the CPU equivalents of the on-chip measurements in the
module docstring; the TPU numbers (builtin tanh 4.4e-5 abs err vs rational
3.95e-7) are re-verified by tools/fidelity_report.py on hardware.
"""

import jax.numpy as jnp
import numpy as np

from neural_speech_decoding_tpu.ops import gates


def test_rational_tanh_accuracy():
    x = np.linspace(-12.0, 12.0, 200001, dtype=np.float32)
    ours = np.asarray(gates.tanh(jnp.asarray(x))).astype(np.float64)
    exact = np.tanh(x.astype(np.float64))
    assert np.abs(ours - exact).max() < 1e-6


def test_rational_sigmoid_accuracy():
    x = np.linspace(-20.0, 20.0, 200001, dtype=np.float32)
    ours = np.asarray(gates.sigmoid(jnp.asarray(x))).astype(np.float64)
    exact = 1.0 / (1.0 + np.exp(-x.astype(np.float64)))
    assert np.abs(ours - exact).max() < 5e-7


def test_saturation_and_symmetry():
    x = np.asarray([-50.0, -8.5, 0.0, 8.5, 50.0], dtype=np.float32)
    t = np.asarray(gates.tanh(jnp.asarray(x)))
    # the clamp saturates within 2 ulp of +/-1 (never overshoots)
    assert np.abs(t).max() <= 1.0
    assert t[0] < -1.0 + 3e-7 and t[-1] > 1.0 - 3e-7
    assert t[2] == 0.0
    np.testing.assert_array_equal(t, -t[::-1])


def test_non_f32_falls_back_to_builtin():
    x = jnp.linspace(-3, 3, 101, dtype=jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(gates.tanh(x)), np.asarray(jnp.tanh(x))
    )


def test_decoder_gate_math_modes_agree(golden, dataset, checkpoint_path):
    """builtin vs rational recurrences stay close on real data (they are
    the same math through different transcendental implementations)."""
    import dataclasses

    import jax

    from neural_speech_decoding_tpu.config import DecoderConfig
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params

    from neural_speech_decoding_tpu.models.lstm import decoder_apply

    params = load_decoder_params(checkpoint_path)
    x = dataset.windows[:8]
    out = {}
    for gm in ("rational", "builtin"):
        cfg = dataclasses.replace(DecoderConfig(), gate_math=gm)
        out[gm] = np.asarray(jax.jit(
            lambda p, w, cfg=cfg: decoder_apply(p, w, cfg)
        )(params, x))
    assert np.abs(out["rational"] - out["builtin"]).max() < 1e-3
    assert (out["rational"].argmax(1) == out["builtin"].argmax(1)).all()
