"""SerialBoard tests over a PTY (no hardware, no pyserial)."""

import os
import pty
import threading
import time

import numpy as np
import pytest

from neural_speech_decoding_tpu.runtime.serial_board import SerialBoard


@pytest.fixture
def fake_device(dataset):
    """PTY whose master side streams trial samples as CSV lines."""
    master, slave = pty.openpty()
    path = os.ttyname(slave)
    stop = threading.Event()
    data = dataset.windows[0]  # [625, 8]

    def writer():
        i = 0
        # drain config writes so the buffer never blocks
        os.set_blocking(master, False)
        while not stop.is_set():
            try:
                os.read(master, 4096)
            except (BlockingIOError, OSError):
                pass
            row = data[i % len(data)]
            line = ",".join(f"{v:.7f}" for v in row) + "\n"
            try:
                os.write(master, line.encode())
            except OSError:
                break
            i += 1
            if i % 50 == 0:
                time.sleep(0.001)

    t = threading.Thread(target=writer, daemon=True)
    t.start()
    yield path, data
    stop.set()
    t.join(timeout=2)
    for fd in (master,):
        try:
            os.close(fd)
        except OSError:
            pass


def test_serial_board_streams(fake_device):
    path, data = fake_device
    b = SerialBoard(path, num_channels=8, sample_rate=125)
    b.prepare_session()
    b.config_board("chon_1_12")  # written to the device
    b.start_stream(5000)
    try:
        deadline = time.time() + 15
        while b.get_board_data_count() < 100 and time.time() < deadline:
            time.sleep(0.02)
        got = b.get_current_board_data(50)
    finally:
        b.stop_stream()
        b.release_session()
    assert got.shape == (9, 50)
    eeg = got[b.eeg_channels, :].T  # [50, 8]
    # every received sample must match one of the source rows (to text
    # round-trip precision)
    src = data.astype(np.float64)  # [625, 8]
    for row in eeg:
        dist = np.abs(src - row).max(axis=1).min()
        assert dist < 1e-4, dist
    # counter advances monotonically
    assert (np.diff(got[0]) > 0).all()
    assert "chon_1_12" in b.config_log


def test_serial_board_ignores_garbage_lines(tmp_path, dataset):
    """Echo/status lines and malformed frames are skipped."""
    master, slave = pty.openpty()
    path = os.ttyname(slave)
    b = SerialBoard(path, num_channels=8)
    b.prepare_session()
    b.start_stream(1000)
    try:
        os.write(master, b"OK registered\n")
        os.write(master, b"1.0,2.0\n")  # too few channels
        os.write(master, b"not,numbers,a,b,c,d,e,f\n")
        row = ",".join(f"{v:.4f}" for v in dataset.windows[0][0]) + "\n"
        os.write(master, row.encode())
        deadline = time.time() + 10
        while b.get_board_data_count() < 1 and time.time() < deadline:
            time.sleep(0.02)
        assert b.get_board_data_count() == 1
    finally:
        b.stop_stream()
        b.release_session()
        os.close(master)


def test_serial_board_missing_device():
    b = SerialBoard("/dev/does_not_exist_xyz")
    with pytest.raises(FileNotFoundError):
        b.prepare_session()
