"""Epoching op + bulk recording decode tests."""

import numpy as np
import pytest

from neural_speech_decoding_tpu.ops.epoching import (
    frame_signal,
    frame_times,
    num_frames,
)


def test_num_frames():
    assert num_frames(625, 625, 125) == 1
    assert num_frames(1250, 625, 125) == 6
    assert num_frames(624, 625, 125) == 0


def test_frame_signal_matches_strided():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal((1000, 8)).astype(np.float32)
    window, hop = 300, 100
    frames = np.asarray(frame_signal(sig, window, hop))
    n = num_frames(1000, window, hop)
    assert frames.shape == (n, window, 8)
    for i in range(n):
        np.testing.assert_array_equal(frames[i], sig[i * hop : i * hop + window])


def test_frame_signal_too_short():
    with pytest.raises(ValueError, match="shorter than window"):
        frame_signal(np.zeros((10, 8), np.float32), 100, 10)


def test_frame_times():
    starts, ends = frame_times(1250, 625, 125, 125.0)
    np.testing.assert_allclose(np.asarray(starts), np.arange(6) * 1.0)
    np.testing.assert_allclose(np.asarray(ends), np.arange(6) * 1.0 + 5.0)


def test_decode_recording(checkpoint_path, dataset):
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(str(checkpoint_path))
    # stitch 3 trials into one continuous 15 s recording
    recording = np.concatenate(list(dataset.windows[:3]), axis=0)
    probs, starts = engine.decode_recording(recording, hop_seconds=5.0)
    assert probs.shape == (3, 3)
    np.testing.assert_allclose(starts, [0.0, 5.0, 10.0])
    # non-overlapping 5 s hops reproduce per-trial decoding exactly
    direct = engine.predict_batch(dataset.windows[:3])
    np.testing.assert_allclose(probs, direct, atol=1e-6)

    # overlapping hop produces the right frame count
    probs2, starts2 = engine.decode_recording(recording, hop_seconds=1.0)
    assert probs2.shape == (11, 3)
    assert abs(probs2.sum(1) - 1).max() < 1e-4

    with pytest.raises(ValueError, match="shorter"):
        engine.decode_recording(recording[:100])
