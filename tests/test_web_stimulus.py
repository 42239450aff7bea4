"""Browser stimulus presenter, driven over real HTTP.

Covers the subject-facing protocol surface the reference ran through
PsychoPy (reference: Neural_decoding_data_collector.py:543-693): beep /
word / cool-off transitions visible to the page, the seq monotonicity the
page keys its beep replay protection on, the Escape abort path, and a
full (abridged) experiment session recording trials while presenting.
"""

import json
import urllib.request

import numpy as np
import pytest

from neural_speech_decoding_tpu.collector.web_stimulus import WebPresenter


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=5) as r:
        return r.status, r.read()


def _post(port, path):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", method="POST", data=b""
    )
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, r.read()


@pytest.fixture()
def presenter():
    p = WebPresenter(port=0)  # ephemeral
    yield p
    p.close()


def test_page_serves(presenter):
    status, body = _get(presenter.port, "/")
    assert status == 200
    text = body.decode()
    assert "AudioContext" in text  # the WebAudio beep
    assert "Escape" in text  # keyboard abort


def test_phase_transitions_and_seq(presenter):
    seqs = []
    for call, phase, word in [
        (presenter.beep, "beep", ""),
        (lambda: presenter.show_word("water"), "word", "water"),
        (presenter.cool_off, "cooloff", ""),
    ]:
        call()
        _, body = _get(presenter.port, "/api/stimulus")
        s = json.loads(body)
        assert s["phase"] == phase
        assert s["word"] == word
        seqs.append(s["seq"])
    assert seqs == sorted(seqs) and len(set(seqs)) == 3  # strictly increasing


def test_status_line(presenter):
    presenter.status("warming up…")
    _, body = _get(presenter.port, "/api/stimulus")
    assert json.loads(body)["status"] == "warming up…"


def test_abort_over_http(presenter):
    assert not presenter.aborted()
    status, _ = _post(presenter.port, "/api/abort")
    assert status == 200
    assert presenter.aborted()


def test_404s(presenter):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(presenter.port, "/nope")
    assert exc.value.code == 404


def test_full_session_with_web_presenter(tmp_path):
    """An abridged collection session records trials while the web
    presenter serves the protocol — the end-to-end '--stimulus web' path."""
    from neural_speech_decoding_tpu.collector.experiment import (
        ExperimentConfig,
        run_experiment,
    )
    from neural_speech_decoding_tpu.runtime.board import open_board

    p = WebPresenter(port=0)
    board = open_board("synthetic", speed=512.0)
    board.prepare_session()
    board.start_stream()
    try:
        cfg = ExperimentConfig(words=("water", "food"), n_reps=1, seed=0,
                               warmup_seconds=0.5)
        paths = run_experiment(board, str(tmp_path), cfg, presenter=p,
                               speed=512.0)
    finally:
        board.stop_stream()
        board.release_session()
        p.close()
    assert len(paths) == 2
    for path in paths:
        data = np.loadtxt(path, delimiter=",")
        assert data.shape == (625, 8)
    # the presenter ended on the session's final state
    assert json.loads(_get_state(p))["seq"] >= 6  # 2 trials x 3 phases


def _get_state(p):
    # after close() the server is down; read the final state directly
    return json.dumps(p._state)
