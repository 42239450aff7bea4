"""Reference import-surface compatibility tests (Utilities package)."""

import queue

import numpy as np
import pytest


def test_preprocessor_compat(dataset):
    from Utilities.preprocessor import PreProcessor

    pre = PreProcessor(sr=125, tailoring_lambda=1.25e-29)
    out = pre.transform(dataset.windows[0])
    assert out.shape == (625, 8)
    assert out.dtype == np.float32
    with pytest.raises(ValueError, match="Expected 2D"):
        pre.transform(np.zeros((10,)))


def test_preprocessor_matches_filter(dataset):
    """Utilities.PreProcessor == ops.mai_filter on the same window."""
    from Utilities.preprocessor import PreProcessor

    from neural_speech_decoding_tpu.config import FilterConfig
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter

    pre = PreProcessor(sr=125)
    a = pre.transform(dataset.windows[1])
    b = np.asarray(mai_filter(dataset.windows[1], FilterConfig()))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_kuramoto_sklearn_facade(dataset):
    from neural_speech_decoding_tpu.ops.kuramoto import (
        KuramotoSpatialFilter,
        kuramoto_spatial_filter,
    )

    x_ct = dataset.windows[0].T.astype(np.float64)  # [C, T]
    f = KuramotoSpatialFilter(lambd=1.25e-29)
    out = f.fit_transform(x_ct)
    assert out.shape == x_ct.shape
    out2 = kuramoto_spatial_filter(x_ct, 1.25e-29)
    np.testing.assert_allclose(out, out2, atol=1e-9)


def test_streaming_process_compat(dataset):
    from Utilities.streaming_process import StreamingProcess

    from neural_speech_decoding_tpu.runtime.board import ReplayBoard

    q: "queue.Queue" = queue.Queue(maxsize=8)
    proc = StreamingProcess(
        ReplayBoard(dataset.windows[:2], speed=128.0), out_queue=q
    )
    proc.start()
    proc.recording_flag.value = True
    try:
        item = q.get(timeout=15)
    finally:
        proc.recording_flag.value = False
        proc.stop()
        proc.join(timeout=5)
    assert item["data"].shape == (625, 8)
    assert item["sr"] == 125


def test_neurokit_connector_compat(dataset):
    import time

    from Utilities.neurokit_connector import NeuroPawnConnector

    from neural_speech_decoding_tpu.runtime.board import ReplayBoard

    conn = NeuroPawnConnector(ReplayBoard(dataset.windows[:2], speed=128.0))
    conn.start_stream()
    try:
        deadline = time.time() + 10
        while conn.board.get_board_data_count() < 625 and time.time() < deadline:
            time.sleep(0.01)
        win = conn.get_window(5.0)
    finally:
        conn.stop_stream()
    assert win.shape == (8, 625)
    assert conn.sr == 125
    assert len(conn.eeg_channels) == 8


def test_knight_board_legacy_connector(dataset):
    import time

    from Utilities.knight_board_init import KnightBoard

    from neural_speech_decoding_tpu.runtime.board import ReplayBoard

    board = ReplayBoard(dataset.windows[:2], speed=128.0)
    kb = KnightBoard(board, 8)
    kb.start_stream()
    try:
        deadline = time.time() + 10
        while board.get_board_data_count() < 625 and time.time() < deadline:
            time.sleep(0.01)
        win = kb.get_window(5.0)
    finally:
        kb.stop_stream()
    assert win.shape == (8, 625)
    # legacy path: channel config happens after the stream starts
    assert len(board.config_log) == 16


def test_tester_cli_combine_flag(monkeypatch, tmp_path):
    """--combine median reaches EnsembleEngine.from_manifest (manifest
    serving is the only path it applies to)."""
    import json

    from neural_speech_decoding_tpu.runtime import tester as tester_mod

    manifest = tmp_path / "ens_manifest.json"
    manifest.write_text(json.dumps({"model": "tcn_small", "members": []}))
    seen = {}

    def fake_from_manifest(path, **kw):
        seen.update(kw, path=path)
        return object()

    class _Stats:
        windows_per_second = 1.0
        latency = {}

    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    monkeypatch.setattr(
        EnsembleEngine, "from_manifest", staticmethod(fake_from_manifest)
    )
    monkeypatch.setattr(
        tester_mod, "run_trials_ex", lambda **kw: ("ok", _Stats())
    )
    monkeypatch.setattr(
        "sys.argv",
        ["tester", "--model", str(manifest), "--combine", "median"],
    )
    tester_mod.main()
    assert seen["combine"] == "median"
    assert seen["path"] == str(manifest)
