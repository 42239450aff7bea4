"""Continuous streaming decoder tests."""

import numpy as np
import pytest

from neural_speech_decoding_tpu.runtime.board import ReplayBoard
from neural_speech_decoding_tpu.runtime.stream import StreamDecoder


@pytest.fixture(scope="module")
def engine(checkpoint_path):
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    eng = InferenceEngine(str(checkpoint_path), class_names=("Food", "Water", "None"))
    eng.warmup([1])
    return eng


def test_stream_decode_sliding_windows(dataset, engine):
    board = ReplayBoard(dataset.windows[:4], speed=256.0)
    dec = StreamDecoder(
        engine, board, window_seconds=5.0, hop_seconds=1.0, average_n=5
    )
    seen = []
    preds, stats = dec.run(6, on_prediction=seen.append, timeout=120)
    assert len(preds) == 6
    assert len(seen) == 6
    assert stats.windows == 6
    assert stats.latency.count == 6
    for p in preds:
        assert p.probs.shape == (3,)
        assert abs(p.probs.sum() - 1.0) < 1e-4
        assert p.label in ("Food", "Water", "None")
    # rolling average over at most 5 windows
    expect = np.mean(np.stack([q.probs for q in preds[1:6]]), axis=0)
    np.testing.assert_allclose(preds[5].avg_probs, expect, atol=1e-6)
    # windows advance: board counters strictly increase by >= hop
    counters = [p.counter for p in preds]
    assert all(b - a >= 125 for a, b in zip(counters, counters[1:]))


def test_stream_timeout_returns_partial(dataset, engine):
    board = ReplayBoard(dataset.windows[:2], speed=16.0)
    dec = StreamDecoder(engine, board, window_seconds=5.0, hop_seconds=5.0)
    preds, stats = dec.run(1000, timeout=3.0)
    assert len(preds) < 1000  # partial, no hang
