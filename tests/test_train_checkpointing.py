"""Training checkpoint/resume tests (orbax)."""

import dataclasses

import jax
import numpy as np
import pytest
import optax

from neural_speech_decoding_tpu.config import DecoderConfig
from neural_speech_decoding_tpu.models.lstm import init_decoder_params
from neural_speech_decoding_tpu.train.checkpointing import (
    latest_epoch,
    restore_train_state,
    save_train_state,
)
from neural_speech_decoding_tpu.train.loop import TrainConfig, train


def test_save_restore_roundtrip(tmp_path):
    cfg = DecoderConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    assert latest_epoch(tmp_path / "ck") is None
    save_train_state(tmp_path / "ck", 7, params, opt_state)
    assert latest_epoch(tmp_path / "ck") == 7

    params2 = init_decoder_params(jax.random.PRNGKey(1), cfg)
    opt2 = tx.init(params2)
    step, rp, ro = restore_train_state(tmp_path / "ck", params2, opt2)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optax state structure preserved (count + moments)
    assert jax.tree_util.tree_structure(ro) == jax.tree_util.tree_structure(opt_state)


@pytest.mark.slow
def test_train_resume(tmp_path, dataset):
    sub = dataset._take(np.arange(0, len(dataset), 8))
    sub = dataclasses.replace(sub, windows=sub.windows[:, :64, :])
    base = dict(
        epochs=4, batch_size=8, checkpoint_dir=str(tmp_path / "run"),
        checkpoint_every=2,
    )
    cfg = DecoderConfig(num_classes=3)
    _, hist1 = train(sub, decoder_cfg=cfg, train_cfg=TrainConfig(**base), verbose=False)
    assert len(hist1) == 4
    assert latest_epoch(tmp_path / "run") == 3

    # resuming with more epochs continues from epoch 4
    _, hist2 = train(
        sub, decoder_cfg=cfg,
        train_cfg=TrainConfig(**{**base, "epochs": 6}), verbose=False,
    )
    assert [h["epoch"] for h in hist2] == [4, 5]
