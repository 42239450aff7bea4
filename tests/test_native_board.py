"""Native C++ board engine tests (builds native/ on demand)."""

import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module", autouse=True)
def native_lib():
    lib = REPO_ROOT / "native" / "build" / "libnsdboard.so"
    if not lib.is_file():
        try:
            subprocess.run(
                ["make", "-C", str(REPO_ROOT / "native")],
                check=True,
                capture_output=True,
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            pytest.skip(f"cannot build native lib: {e}")
    from neural_speech_decoding_tpu.runtime import native

    if native.load_library() is None:
        pytest.skip("native lib not loadable")
    return lib


def _drain(board, n=625, timeout=10.0):
    deadline = time.time() + timeout
    while board.get_board_data_count() < n and time.time() < deadline:
        time.sleep(0.01)
    return board.get_current_board_data(n)


def test_native_synthetic_stream():
    from neural_speech_decoding_tpu.runtime.board import NativeBoard

    b = NativeBoard("synthetic", speed=64.0)
    b.prepare_session()
    b.start_stream(buffer_size=5000)
    data = _drain(b)
    b.stop_stream()
    b.release_session()
    assert data.shape == (9, 625)
    assert (np.diff(data[0]) == 1).all()  # counter row
    eeg = data[b.eeg_channels, :]
    assert np.isfinite(eeg).all() and eeg.std() > 0.1


def test_native_replay_reproduces_dataset(dataset):
    from neural_speech_decoding_tpu.runtime.board import NativeBoard

    src = np.concatenate(list(dataset.windows[:2]), axis=0).T  # [C, T]
    b = NativeBoard("replay", speed=128.0,
                    replay_data=src.astype(np.float32))
    b.prepare_session()
    b.start_stream(buffer_size=5000)
    data = _drain(b)
    b.stop_stream()
    b.release_session()
    eeg = data[b.eeg_channels, :].T.astype(np.float32)  # [T, C]
    start = int(data[0, 0]) % src.shape[1]
    idx = (start + np.arange(625)) % src.shape[1]
    np.testing.assert_allclose(eeg, src.T[idx].astype(np.float32), rtol=1e-6)


def test_native_replay_requires_data():
    from neural_speech_decoding_tpu.runtime.board import NativeBoard

    with pytest.raises(ValueError, match="replay_data"):
        NativeBoard("replay")


def test_native_board_through_run_trials(dataset, checkpoint_path):
    """Full stack: C++ engine -> connector -> producer -> TPU-style engine."""
    from neural_speech_decoding_tpu.runtime.board import NativeBoard
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
    from neural_speech_decoding_tpu.runtime.tester import run_trials_ex

    src = np.concatenate(list(dataset.windows[:3]), axis=0).T
    board = NativeBoard("replay", speed=128.0,
                        replay_data=src.astype(np.float32))
    engine = InferenceEngine(str(checkpoint_path),
                             class_names=("Food", "Water", "None"))
    result, stats = run_trials_ex(
        trials=3, serial_port=board, model_path=str(checkpoint_path),
        verbose=False, engine=engine,
    )
    assert result.trials == 3
    assert result.avg_probs.shape == (3,)
    assert stats.latency.count == 3


def test_native_speed_realtime_pacing():
    """At speed=1 the native producer must pace to the sample rate."""
    from neural_speech_decoding_tpu.runtime.board import NativeBoard

    b = NativeBoard("synthetic", speed=1.0)
    b.prepare_session()
    b.start_stream(buffer_size=5000)
    time.sleep(1.0)
    count = b.get_board_data_count()
    b.stop_stream()
    b.release_session()
    # ~125 samples in 1 s (generous bounds for CI jitter)
    assert 60 <= count <= 260, count


def test_native_dsp_matches_scipy():
    import scipy.signal

    from neural_speech_decoding_tpu.ops.iir import butter_sos
    from neural_speech_decoding_tpu.runtime.native import (
        native_detrend_constant,
        native_sosfilt,
    )

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 625)) + 3.0

    d = native_detrend_constant(x)
    np.testing.assert_allclose(d.mean(axis=1), 0.0, atol=1e-12)

    sos = np.asarray(butter_sos("bandpass", 2, 3.0, 48.0, 125.0))
    causal = native_sosfilt(x, sos)
    ref = scipy.signal.sosfilt(sos, x, axis=1)
    np.testing.assert_allclose(causal, ref, rtol=1e-12, atol=1e-12)

    zp = native_sosfilt(x, sos, zero_phase=True)
    fwd = scipy.signal.sosfilt(sos, x, axis=1)
    ref_zp = scipy.signal.sosfilt(sos, fwd[:, ::-1], axis=1)[:, ::-1]
    np.testing.assert_allclose(zp, ref_zp, rtol=1e-12, atol=1e-12)

    with pytest.raises(ValueError, match="sos"):
        native_sosfilt(x, np.zeros((2, 5)))
