"""Training loop reconstruction tests."""

import numpy as np
import pytest

from neural_speech_decoding_tpu.config import DecoderConfig
from neural_speech_decoding_tpu.train.augment import KINDS, augment_batch_np, inject_noise_np
from neural_speech_decoding_tpu.train.loop import TrainConfig, train


@pytest.fixture(scope="module")
def tiny_dataset(dataset):
    """Subsample trials and truncate time so training tests run fast."""
    import dataclasses

    sub = dataset._take(np.arange(0, len(dataset), 4))
    return dataclasses.replace(sub, windows=sub.windows[:, :96, :])


@pytest.mark.slow
def test_train_overfits_tiny(tiny_dataset):
    cfg = DecoderConfig(num_classes=3, dropout=0.0)
    params, history = train(
        tiny_dataset,
        decoder_cfg=cfg,
        train_cfg=TrainConfig(epochs=12, batch_size=16, learning_rate=3e-3),
        verbose=False,
    )
    assert len(history) == 12
    # loss must decrease substantially
    assert history[-1]["train_loss"] < history[0]["train_loss"] * 0.9
    assert np.isfinite(history[-1]["val_loss"])


@pytest.mark.slow
def test_train_with_mesh(tiny_dataset):
    from neural_speech_decoding_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(tp=1)
    cfg = DecoderConfig(num_classes=3)
    params, history = train(
        tiny_dataset,
        decoder_cfg=cfg,
        train_cfg=TrainConfig(epochs=2, batch_size=16),
        mesh=mesh,
        verbose=False,
    )
    assert np.isfinite(history[-1]["train_loss"])


def test_train_mode_dropout_is_stochastic(tiny_dataset):
    """Train-mode forward must differ across rngs (dropout + RReLU live)."""
    import jax

    from neural_speech_decoding_tpu.models.lstm import decoder_apply, init_decoder_params

    cfg = DecoderConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    x = tiny_dataset.windows[:4]
    a = np.asarray(decoder_apply(params, x, cfg, train=True, rng=jax.random.PRNGKey(1)))
    b = np.asarray(decoder_apply(params, x, cfg, train=True, rng=jax.random.PRNGKey(2)))
    assert np.abs(a - b).max() > 1e-6
    # eval mode is deterministic
    c = np.asarray(decoder_apply(params, x, cfg, train=False))
    d = np.asarray(decoder_apply(params, x, cfg, train=False))
    np.testing.assert_array_equal(c, d)


def test_augment_kinds(dataset):
    rng = np.random.default_rng(0)
    w = dataset.windows[0]
    for kind in KINDS:
        out = inject_noise_np(w, kind, rng)
        assert out.shape == w.shape
        assert np.isfinite(out).all()
        if kind != "flatline":
            assert np.abs(out - w).max() > 0
    with pytest.raises(ValueError, match="unknown noise kind"):
        inject_noise_np(w, "nope", rng)


def test_augment_batch(dataset):
    x = dataset.windows[:20]
    y = dataset.labels[:20]
    xa, ya = augment_batch_np(x, y, prob=0.5, seed=0)
    assert xa.shape[0] == ya.shape[0]
    assert 0 < xa.shape[0] <= 20


@pytest.mark.slow
def test_cosine_schedule_and_early_stop(tiny_dataset):
    cfg = DecoderConfig(num_classes=3, dropout=0.0)
    params, history = train(
        tiny_dataset,
        decoder_cfg=cfg,
        train_cfg=TrainConfig(
            epochs=30, batch_size=16, schedule="cosine", warmup_epochs=2,
            early_stop_patience=3,
        ),
        verbose=False,
    )
    # either ran to completion or stopped early; history is contiguous
    assert 3 <= len(history) <= 30
    assert np.isfinite(history[-1]["train_loss"])


def test_unknown_schedule_rejected(tiny_dataset):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown schedule"):
        train(
            tiny_dataset,
            train_cfg=TrainConfig(epochs=1, schedule="nope"),
            verbose=False,
        )


@pytest.mark.slow
def test_remat_and_unroll_training_grads_match(dataset):
    """The remat_chunks / scan_unroll training knobs (the compile-time and
    memory levers for backprop through the 625-step recurrence) change
    neither the loss nor the gradients — only the schedule."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(np.asarray(dataset.windows)[:4, :100], jnp.float32)
    y = jnp.asarray(np.asarray(dataset.labels)[:4], jnp.int32)
    rng = jax.random.PRNGKey(3)

    def grads_for(cfg):
        from neural_speech_decoding_tpu.models.lstm import (
            decoder_apply,
            init_decoder_params,
        )

        params = init_decoder_params(jax.random.PRNGKey(0), cfg)

        def loss(p):
            logits = decoder_apply(p, x, cfg, train=True, rng=rng)
            return -jnp.mean(
                jnp.take_along_axis(
                    jax.nn.log_softmax(logits, -1), y[:, None], axis=1
                )
            )

        l, g = jax.jit(jax.value_and_grad(loss))(params)
        return float(l), g

    base_l, base_g = grads_for(DecoderConfig())
    for kw in ({"remat_chunks": 4}, {"scan_unroll": 5},
               {"remat_chunks": 10, "scan_unroll": 5}):
        l, g = grads_for(DecoderConfig(**kw))
        assert abs(l - base_l) < 1e-6, kw
        for a, b in zip(
            jax.tree_util.tree_leaves(base_g), jax.tree_util.tree_leaves(g)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=str(kw),
            )

    # indivisible chunking is a loud error
    import pytest as _pytest

    with _pytest.raises(ValueError):
        grads_for(DecoderConfig(remat_chunks=7))
