"""BrainFlow adapter tests (the package is absent here, so the live path is
exercised through an injected fake BoardShim module)."""

import sys
import types

import numpy as np
import pytest

from neural_speech_decoding_tpu.runtime.board import open_board


def test_brainflow_spec_gated_without_package():
    try:
        import brainflow  # noqa: F401

        pytest.skip("brainflow unexpectedly present")
    except ImportError:
        pass
    with pytest.raises(ImportError, match="brainflow"):
        open_board("brainflow:/dev/ttyUSB0")


def test_bare_port_spec_still_actionable():
    with pytest.raises(RuntimeError, match="brainflow:<port>"):
        open_board("/dev/cu.usbserial-FTB6SPL3")


@pytest.fixture()
def fake_brainflow(monkeypatch):
    """Install a minimal fake brainflow package that records calls."""
    calls = []

    class FakeShim:
        def __init__(self, board_id, params):
            calls.append(("init", board_id, params.serial_port))
            self._data = np.arange(9 * 100, dtype=np.float64).reshape(9, 100)

        @staticmethod
        def get_sampling_rate(board_id):
            return 125

        @staticmethod
        def get_exg_channels(board_id):
            return list(range(1, 9))

        def prepare_session(self):
            calls.append(("prepare",))

        def config_board(self, cmd):
            calls.append(("config", cmd))
            return "ok"

        def config_board_with_bytes(self, payload):
            calls.append(("config_bytes", payload))

        def start_stream(self, buffer_size):
            calls.append(("start", buffer_size))

        def stop_stream(self):
            calls.append(("stop",))

        def release_session(self):
            calls.append(("release",))

        def get_board_data_count(self):
            return self._data.shape[1]

        def get_current_board_data(self, n):
            return self._data[:, -n:]

    class FakeParams:
        def __init__(self):
            self.serial_port = ""

    class FakeIds:
        NEUROPAWN_KNIGHT_BOARD = 57

    mod = types.ModuleType("brainflow")
    shim_mod = types.ModuleType("brainflow.board_shim")
    shim_mod.BoardShim = FakeShim
    shim_mod.BrainFlowInputParams = FakeParams
    shim_mod.BoardIds = FakeIds
    mod.board_shim = shim_mod
    monkeypatch.setitem(sys.modules, "brainflow", mod)
    monkeypatch.setitem(sys.modules, "brainflow.board_shim", shim_mod)
    return calls


def test_adapter_maps_board_surface(fake_brainflow):
    board = open_board("brainflow:/dev/ttyUSB7")
    assert fake_brainflow[0] == ("init", 57, "/dev/ttyUSB7")
    assert board.get_board_id() == 57
    assert board.get_sampling_rate(board.get_board_id()) == 125
    assert board.get_exg_channels(board.get_board_id()) == list(range(1, 9))

    board.prepare_session()
    board.config_board("chon_1_12")
    board.config_board_with_bytes(b"rldadd_1")
    board.start_stream(450000)
    assert board.get_board_data_count() == 100
    win = board.get_current_board_data(10)
    assert win.shape == (9, 10)
    board.stop_stream()
    board.release_session()
    names = [c[0] for c in fake_brainflow]
    assert names == [
        "init", "prepare", "config", "config_bytes", "start", "stop", "release",
    ]


def test_adapter_explicit_board_id(fake_brainflow):
    open_board("brainflow:/dev/ttyUSB0:2")
    assert fake_brainflow[0] == ("init", 2, "/dev/ttyUSB0")


def test_adapter_works_with_connector(fake_brainflow):
    from neural_speech_decoding_tpu.runtime.connector import Connector

    conn = Connector("brainflow:/dev/ttyACM1", num_channels=8)
    conn.start_stream()
    win = conn.get_window(0.08)  # 10 samples at 125 Hz
    assert win.shape == (8, 10)
    conn.stop_stream()
    assert ("config_bytes", b"chon_1_12") in fake_brainflow


def test_adapter_works_with_stream_decoder(fake_brainflow, checkpoint_path):
    """StreamDecoder must run over the adapter (it reads board._streaming
    for session ownership — regression: the adapter initially lacked it)."""
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
    from neural_speech_decoding_tpu.runtime.stream import StreamDecoder

    engine = InferenceEngine(str(checkpoint_path))
    decoder = StreamDecoder(
        engine, "brainflow:/dev/ttyS9", window_seconds=0.2, hop_seconds=0.1,
        average_n=2,
    )
    # the fake shim pre-fills 100 static samples (0.8 s at 125 Hz) — enough
    # for exactly one window; the counter never advances for a second hop
    preds, stats = decoder.run(1, timeout=30, warm=False)
    assert len(preds) == 1
    assert preds[0].probs.shape == (3,)
    names = [c[0] for c in fake_brainflow]
    assert "prepare" in names and "start" in names and "release" in names
