"""Frontend tests: shared helpers + the stdlib web dashboard."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from neural_speech_decoding_tpu.frontend import common
from neural_speech_decoding_tpu.frontend.server import Handler


def test_mock_probs_contract():
    rng = np.random.default_rng(0)
    probs = common.generate_mock_probs("Water", rng)
    assert set(probs) == set(common.CLASSES)
    assert 0.60 <= probs["Water"] <= 0.70
    assert abs(sum(probs.values()) - 1.0) < 1e-9


def test_mock_eeg_shape():
    eeg = common.generate_mock_eeg(np.random.default_rng(0))
    assert eeg.shape == (common.SAMPLES, common.CHANNELS)
    assert np.isfinite(eeg).all()


def test_normalize_eeg_zscore():
    rng = np.random.default_rng(1)
    chunk = rng.standard_normal((625, 8)) * 5 + 3
    out = common.normalize_eeg(chunk)
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-9)
    np.testing.assert_allclose(out.std(axis=0), 1.0, atol=1e-3)


def test_mock_snapshot_roundtrip():
    snap = common.mock_snapshot("Food", seed=0)
    d = snap.to_json_dict()
    assert json.dumps(d)  # JSON-serializable
    assert d["transcript"].startswith("Predicted:")
    assert len(d["eeg"]) == common.SAMPLES


@pytest.fixture(scope="module")
def dashboard():
    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=10) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_dashboard_page(dashboard):
    status, body = _get(dashboard + "/")
    assert status == 200
    assert b"Imagined-Speech Decoding" in body


def test_dashboard_state(dashboard):
    status, body = _get(dashboard + "/api/state")
    assert status == 200
    state = json.loads(body)
    assert "word_probs" in state


def test_dashboard_mock_decode(dashboard):
    status, snap = _post(dashboard + "/api/decode", {"mode": "mock", "focus": "Water"})
    assert status == 200
    assert snap["word_probs"]["Water"] >= 0.60
    assert snap["transcript"].startswith("Predicted:")


def test_dashboard_bad_request(dashboard):
    status, snap = _post(dashboard + "/api/decode", {"mode": "device", "board": "/dev/bogus", "trials": 1})
    assert status == 500
    assert "error" in snap
    assert "serial port" in snap["error"]


def test_dashboard_404(dashboard):
    import urllib.error

    with pytest.raises(urllib.error.HTTPError):
        _get(dashboard + "/api/nope")


def test_dashboard_stream_endpoint(dashboard, dataset, checkpoint_path, monkeypatch):
    """Streaming endpoint runs the continuous decoder over a replay board."""
    import neural_speech_decoding_tpu.frontend.server as srv
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    eng = InferenceEngine(str(checkpoint_path), class_names=("Food", "Water", "None"))
    eng.warmup([1])
    srv.STATE.engines["lstm"] = eng

    import neural_speech_decoding_tpu.runtime.board as board_mod

    monkeypatch.setattr(
        board_mod,
        "open_board",
        lambda spec, num_channels=8, speed=1.0: board_mod.ReplayBoard(
            dataset.windows[:3], speed=256.0
        ),
    )
    status, body = _post(
        dashboard + "/api/stream",
        {"board": "replay", "predictions": 3, "hop_seconds": 1.0, "timeout": 60},
    )
    assert status == 200
    assert len(body["predictions"]) == 3
    assert body["latency_p50_ms"] > 0
    for p in body["predictions"]:
        assert abs(sum(p["probs"]) - 1.0) < 1e-4


def test_dashboard_stream_error(dashboard):
    status, body = _post(dashboard + "/api/stream", {"board": "/dev/nope", "predictions": 1})
    assert status == 500
    assert "error" in body


def test_streamlit_app_compiles():
    """streamlit isn't installed here; at minimum the app must be valid
    Python (syntax-checked without executing)."""
    import py_compile
    from pathlib import Path

    path = (
        Path(__file__).resolve().parents[1]
        / "neural_speech_decoding_tpu/frontend/app.py"
    )
    py_compile.compile(str(path), doraise=True)


def test_server_resolves_manifest_engine(tmp_path):
    """/api routes serve a fit_ensemble manifest path through
    EnsembleEngine (cached by path)."""
    import jax

    from neural_speech_decoding_tpu.frontend import server as srv
    from neural_speech_decoding_tpu.io.params_io import save_params_npz
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    spec = get_model("logcov")
    paths = []
    for s in range(2):
        p = tmp_path / f"m{s}.npz"
        save_params_npz(p, spec.init(jax.random.PRNGKey(s)))
        paths.append(str(p))
    manifest = tmp_path / "x_manifest.json"
    manifest.write_text(json.dumps({"model": "logcov", "members": paths}))

    eng = srv._resolve_engine("logcov", str(manifest))
    assert isinstance(eng, EnsembleEngine)
    # cached under (family, path), and reused on the next resolve
    assert srv._resolve_engine("logcov", str(manifest)) is eng
    # a wrong-family construction error does NOT poison the cache: the
    # default checkpoint is a .pth, which non-lstm families must reject
    with pytest.raises(ValueError):
        srv._resolve_engine("eegnet", None)
    assert not any(k[0] == "eegnet" for k in srv.STATE.engines)


def test_server_engine_cache_validation_and_invalidation(tmp_path):
    """Round-3 cache semantics: a wrong-family manifest request errors
    instead of silently serving the manifest's model; rewriting a
    checkpoint at the same path (new mtime) invalidates the entry; the
    cache is bounded."""
    import os
    import time as _time

    import jax

    from neural_speech_decoding_tpu.frontend import server as srv
    from neural_speech_decoding_tpu.io.params_io import save_params_npz
    from neural_speech_decoding_tpu.models.registry import get_model

    spec = get_model("logcov")
    member = tmp_path / "m0.npz"
    save_params_npz(member, spec.init(jax.random.PRNGKey(0)))
    manifest = tmp_path / "y_manifest.json"
    manifest.write_text(
        json.dumps({"model": "logcov", "members": [str(member)]})
    )

    # family must match the manifest's own model
    with pytest.raises(ValueError, match="serves model"):
        srv._resolve_engine("tcn", str(manifest))

    eng1 = srv._resolve_engine("logcov", str(manifest))
    assert srv._resolve_engine("logcov", str(manifest)) is eng1
    # touch the manifest: mtime moves, entry invalidates, engine rebuilds
    _time.sleep(0.01)
    os.utime(manifest)
    eng2 = srv._resolve_engine("logcov", str(manifest))
    assert eng2 is not eng1

    # LRU bound holds
    assert len(srv.STATE.engines) <= srv._ENGINE_CACHE_MAX
