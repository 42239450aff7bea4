"""Failure-path robustness tests for the streaming runtime."""

import queue
import time

import numpy as np
import pytest

from neural_speech_decoding_tpu.runtime.board import ReplayBoard
from neural_speech_decoding_tpu.runtime.streaming import StreamingProducer


class DyingBoard(ReplayBoard):
    """Board whose data reads start failing after `fail_after` calls."""

    def __init__(self, *args, fail_after=3, **kwargs):
        super().__init__(*args, **kwargs)
        self._reads = 0
        self.fail_after = fail_after

    def get_current_board_data(self, n):
        self._reads += 1
        if self._reads > self.fail_after:
            raise RuntimeError("device vanished (simulated)")
        return super().get_current_board_data(n)


def test_producer_surfaces_midstream_death(dataset):
    board = DyingBoard(dataset.windows[:2], speed=256.0, fail_after=2)
    q: "queue.Queue" = queue.Queue(maxsize=8)
    prod = StreamingProducer(board, out_queue=q)
    prod.start()
    prod.recording_flag.value = True
    prod.join(timeout=30)
    assert not prod.is_alive()
    assert prod.error is not None
    assert "vanished" in str(prod.error)


def test_run_trials_reports_midstream_death(dataset, checkpoint_path):
    from neural_speech_decoding_tpu.runtime.tester import run_trials_ex

    board = DyingBoard(dataset.windows[:2], speed=256.0, fail_after=1)
    with pytest.raises(RuntimeError, match="Producer exited unexpectedly"):
        run_trials_ex(
            trials=5, serial_port=board, model_path=str(checkpoint_path),
            verbose=False, queue_timeout=1.0,
        )


def test_nondefault_window_geometry(dataset, checkpoint_path):
    """2.5 s windows (312 samples) decode through the same engine — the
    pipeline is shape-polymorphic per compilation."""
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(str(checkpoint_path))
    short = dataset.windows[:2, :312, :]
    probs = engine.predict_batch(short)
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)


def test_dataset_summary_stats(dataset):
    w = dataset.windows
    # SURVEY §2.5: units uV, per-channel sigma ~1.4-2.1, range ~-79..117
    sigma = w.std(axis=(0, 1))
    assert (sigma > 0.5).all() and (sigma < 5.0).all()
    assert w.min() > -200 and w.max() < 200


def test_eeg_augment_kinds():
    """time_shift / scale / channel_drop: label-preserving transforms with
    the expected structure."""
    import numpy as np

    from neural_speech_decoding_tpu.train.augment import (
        ALL_KINDS,
        augment_batch_np,
        inject_noise_np,
    )

    rng = np.random.default_rng(0)
    w = rng.standard_normal((625, 8)).astype(np.float32)

    shifted = inject_noise_np(w, "time_shift", np.random.default_rng(1))
    assert shifted.shape == w.shape
    assert np.isclose(np.abs(shifted).sum(), np.abs(w).sum(), rtol=1e-5)  # a roll

    scaled = inject_noise_np(w, "scale", np.random.default_rng(2))
    ratio = scaled / w
    per_ch = ratio.mean(axis=0)
    assert np.allclose(ratio, per_ch[None, :], atol=1e-5)  # per-channel constant
    assert np.all((per_ch >= 0.8) & (per_ch <= 1.2))

    dropped = inject_noise_np(w, "channel_drop", np.random.default_rng(3))
    zero_cols = np.flatnonzero(np.all(dropped == 0.0, axis=0))
    assert len(zero_cols) == 1

    xs, ys = augment_batch_np(
        np.stack([w] * 10), np.arange(10), prob=1.0, kinds=ALL_KINDS, seed=0
    )
    assert xs.shape[0] == 10 and (ys == np.arange(10)).all()
