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
