"""Runtime layer tests: boards, connector, streaming producer, run_trials."""

import queue
import time

import numpy as np
import pytest

from neural_speech_decoding_tpu.runtime.board import (
    ReplayBoard,
    RingBuffer,
    SyntheticBoard,
    open_board,
)
from neural_speech_decoding_tpu.runtime.connector import Connector
from neural_speech_decoding_tpu.runtime.streaming import StreamingProducer


# ---------------------------------------------------------------- ring buffer
def test_ring_buffer_wraparound():
    rb = RingBuffer(rows=2, capacity=10)
    rb.push(np.arange(16, dtype=np.float64).reshape(2, 8))
    assert rb.count() == 8
    np.testing.assert_array_equal(rb.latest(3)[0], [5, 6, 7])
    rb.push(np.arange(16, 28, dtype=np.float64).reshape(2, 6))
    assert rb.count() == 10  # capped at capacity
    # latest 10 spans the wrap boundary: last 4 of first push + 6 of second
    np.testing.assert_array_equal(rb.latest(10)[0], [4, 5, 6, 7, 16, 17, 18, 19, 20, 21])
    # request more than available
    assert rb.latest(50).shape == (2, 10)


def test_ring_buffer_empty():
    rb = RingBuffer(rows=3, capacity=8)
    assert rb.count() == 0
    assert rb.latest(5).shape == (3, 0)


# ---------------------------------------------------------------- boards
def test_synthetic_board_stream():
    b = SyntheticBoard(speed=64.0)
    b.prepare_session()
    b.start_stream(buffer_size=5000)
    deadline = time.time() + 10
    while b.get_board_data_count() < 625 and time.time() < deadline:
        time.sleep(0.01)
    data = b.get_current_board_data(625)
    b.stop_stream()
    b.release_session()
    assert data.shape == (9, 625)  # counter row + 8 channels
    eeg = data[b.eeg_channels, :]
    assert np.isfinite(eeg).all()
    assert eeg.std() > 0.1  # actually generating signal
    # counter row is monotonically increasing
    assert (np.diff(data[0]) == 1).all()


def test_replay_board_reproduces_dataset(dataset):
    src = dataset.windows[:2]  # [2, 625, 8]
    b = ReplayBoard(src, speed=128.0)
    b.prepare_session()
    b.start_stream(buffer_size=5000)
    deadline = time.time() + 10
    while b.get_board_data_count() < 625 and time.time() < deadline:
        time.sleep(0.01)
    data = b.get_current_board_data(625)
    b.stop_stream()
    b.release_session()
    eeg = data[b.eeg_channels, :].T.astype(np.float32)  # [T, C]
    # samples must be a contiguous slice of the concatenated source
    concat = np.concatenate([src[0], src[1]], axis=0)
    start = int(data[0, 0]) % concat.shape[0]
    expected = np.take(
        concat, (start + np.arange(625)) % concat.shape[0], axis=0
    )
    np.testing.assert_allclose(eeg, expected, rtol=1e-6)


def test_open_board_specs(data_dir):
    assert isinstance(open_board("synthetic"), SyntheticBoard)
    assert isinstance(open_board(f"replay:{data_dir}"), ReplayBoard)
    with pytest.raises(RuntimeError, match="serial port"):
        open_board("/dev/cu.usbserial-FTB6SPL3")


# ---------------------------------------------------------------- connector
def test_connector_configures_and_windows(dataset):
    board = ReplayBoard(dataset.windows[:2], speed=128.0)
    conn = Connector(board, num_channels=8)
    conn.start_stream()
    try:
        deadline = time.time() + 10
        while board.get_board_data_count() < 625 and time.time() < deadline:
            time.sleep(0.01)
        win = conn.get_window(5.0)
        assert win.shape == (8, 625)
    finally:
        conn.stop_stream()
    # per-channel config commands sent before start (chon + rldadd per ch)
    assert len(board.config_log) == 16
    assert board.config_log[0] == "chon_1_12"
    assert board.config_log[1] == "rldadd_1"


# ---------------------------------------------------------------- streaming
def test_streaming_producer_emits_windows(dataset):
    board = ReplayBoard(dataset.windows[:3], speed=128.0)
    q: "queue.Queue" = queue.Queue(maxsize=8)
    prod = StreamingProducer(board, out_queue=q, window_seconds=5.0)
    prod.start()
    prod.recording_flag.value = True
    try:
        payloads = [q.get(timeout=15) for _ in range(3)]
    finally:
        prod.recording_flag.value = False
        prod.stop()
        prod.join(timeout=5)
    for p in payloads:
        assert p["sr"] == 125
        assert p["data"].shape == (625, 8)
        assert p["data"].dtype == np.float32
        assert p["t_emit"] > 0
    # rate limit: emissions at least ~window/speed apart
    gaps = np.diff([p["t_emit"] for p in payloads])
    assert (gaps > 0.5 * 5.0 / 128.0).all()


def test_streaming_producer_error_surfaces():
    prod = StreamingProducer("/dev/ttyUSB_NOPE")
    prod.start()
    prod.join(timeout=10)
    assert not prod.is_alive()
    assert prod.error is not None


def test_producer_drop_oldest(dataset):
    board = ReplayBoard(dataset.windows[:2], speed=256.0)
    q: "queue.Queue" = queue.Queue(maxsize=2)
    prod = StreamingProducer(board, out_queue=q, window_seconds=5.0)
    prod.start()
    prod.recording_flag.value = True
    try:
        # wait (load-tolerant) until the producer has overflowed the
        # 2-slot queue at least once; drop-oldest keeps qsize at maxsize
        deadline = time.time() + 30
        while q.qsize() < 2 and time.time() < deadline:
            time.sleep(0.05)
        assert q.qsize() == 2
    finally:
        prod.recording_flag.value = False
        prod.stop()
        prod.join(timeout=5)


# ---------------------------------------------------------------- run_trials
@pytest.fixture(scope="module")
def shared_engine(checkpoint_path):
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    eng = InferenceEngine(str(checkpoint_path), class_names=("Food", "Water", "None"))
    eng.warmup([1])
    return eng


def test_run_trials_parity_surface(dataset, checkpoint_path, shared_engine):
    from neural_speech_decoding_tpu.runtime.tester import run_trials_ex

    board = ReplayBoard(dataset.windows[:5], speed=128.0)
    result, stats = run_trials_ex(
        trials=4,
        serial_port=board,
        model_path=str(checkpoint_path),
        verbose=False,
        engine=shared_engine,
    )
    assert result.trials == 4
    assert result.avg_probs.shape == (3,)
    assert abs(result.avg_probs.sum() - 1.0) < 1e-5
    assert result.avg_chunk.shape == (625, 8)
    assert stats.latency.count == 4
    assert stats.windows_per_second > 0
    assert len(stats.labels) == 4
    assert set(stats.labels) <= {"Food", "Water", "None"}


def test_utilities_compat_import(dataset, checkpoint_path, shared_engine):
    """The reference's documented install check: import run_trials from
    Utilities.tester (reference: readme.md:21-26)."""
    from Utilities.tester import TrialResult, run_trials, run_trials_ex

    assert callable(run_trials)
    board = ReplayBoard(dataset.windows[:3], speed=128.0)
    result, _ = run_trials_ex(
        trials=2, serial_port=board, model_path=str(checkpoint_path),
        verbose=False, engine=shared_engine,
    )
    assert isinstance(result, TrialResult)
    assert result.trials == 2


def test_simple_predictor_compat(dataset, checkpoint_path, golden):
    from Utilities.lstm_eeg_model import SimplePredictor

    from conftest import golden_rows

    pred = SimplePredictor(pth_path=str(checkpoint_path), sr=125)
    probs, label = pred.predict(dataset.windows[0])
    assert probs.shape == (3,)
    assert probs.dtype == np.float32
    row = golden_rows(golden, dataset.files[:1])[0]
    np.testing.assert_allclose(probs, golden["probs"][row], atol=1e-4)
    assert label == ("Food", "Water", "BG-Noise")[int(golden["probs"][row].argmax())]


def test_replay_board_from_npy(tmp_path, dataset):
    path = tmp_path / "trials.npy"
    np.save(path, dataset.windows[:2])
    b = ReplayBoard(str(path), speed=128.0)
    b.prepare_session()
    b.start_stream(5000)
    try:
        deadline = time.time() + 10
        while b.get_board_data_count() < 100 and time.time() < deadline:
            time.sleep(0.01)
        assert b.get_board_data_count() >= 100
    finally:
        b.stop_stream()
        b.release_session()
    with pytest.raises(ValueError, match="2D/3D"):
        ReplayBoard(np.zeros((5,), np.float32))
