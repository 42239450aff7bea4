"""Dependency-free web dashboard (stdlib http.server).

The reference UI is Streamlit; this environment (and many production TPU
VMs) has no Streamlit, so the framework also ships a zero-dependency
dashboard with the same behavior map: mock mode, device snapshots through
the streaming runtime, probability cards, the z-scored 8-channel chart,
transcript, and runtime stats.

  python -m neural_speech_decoding_tpu.frontend.server --port 8777

Endpoints:
  GET  /            the dashboard page
  GET  /api/state   last snapshot as JSON
  POST /api/decode  {"mode": "mock"|"device", "board": ..., "speed": ...,
                     "trials": ..., "family": ..., "model_path": ...}
  POST /api/stream  {"board": ..., "speed": ..., "predictions": ...,
                     "hop_seconds": ..., "average_n": ..., "family": ...}
                    -> continuous sliding-window decode (runtime/stream.py)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from neural_speech_decoding_tpu.frontend import common

_PAGE = """<!DOCTYPE html>
<html><head><title>TPU EEG Decoding</title>
<style>
 body { font-family: system-ui, sans-serif; background:#111; color:#eee; margin:2rem; }
 .cards { display:flex; gap:1rem; margin:1rem 0; }
 .card { background:#1c1c24; border:1px solid #333; border-radius:12px; padding:1rem 1.5rem; min-width:10rem; }
 .label { color:#9ca3af; font-size:.8rem; }
 .value { font-size:1.8rem; font-weight:700; }
 button { background:#4f46e5; color:white; border:0; border-radius:8px; padding:.6rem 1.4rem; font-size:1rem; cursor:pointer; }
 select,input { background:#222; color:#eee; border:1px solid #444; border-radius:6px; padding:.3rem; }
 #status { color:#9ca3af; margin:.5rem 0; }
 svg { background:#1c1c24; border:1px solid #333; border-radius:12px; }
</style></head>
<body>
<h2>Imagined-Speech Decoding — TPU backend</h2>
<div>
 mode <select id="mode"><option value="mock">mock</option><option value="device">device</option></select>
 board <input id="board" value="replay" size="12">
 speed <input id="speed" value="32" size="4">
 trials <input id="trials" value="10" size="4">
 family <select id="family"><option>lstm</option><option>eegnet</option><option>transformer</option></select>
 <button onclick="decode()">Start</button>
</div>
<div id="status">Press Start to begin.</div>
<div class="cards" id="cards"></div>
<div><svg id="chart" width="900" height="300"></svg></div>
<div id="transcript"></div>
<script>
async function decode() {
  document.getElementById('status').textContent = 'Recording…';
  const body = {
    mode: document.getElementById('mode').value,
    board: document.getElementById('board').value,
    speed: parseFloat(document.getElementById('speed').value),
    trials: parseInt(document.getElementById('trials').value),
    family: document.getElementById('family').value,
  };
  const r = await fetch('/api/decode', {method:'POST', headers:{'Content-Type':'application/json'}, body: JSON.stringify(body)});
  render(await r.json());
}
function render(s) {
  document.getElementById('status').textContent = s.status + (s.stats_line ? ' — ' + s.stats_line : '');
  const cards = document.getElementById('cards');
  cards.innerHTML = '';
  for (const [label, p] of Object.entries(s.word_probs)) {
    cards.innerHTML += `<div class="card"><div class="label">${label}</div><div class="value">${(100*p).toFixed(2)}%</div></div>`;
  }
  document.getElementById('transcript').textContent = s.transcript;
  const svg = document.getElementById('chart');
  svg.innerHTML = '';
  if (!s.eeg) return;
  const T = s.eeg.length, C = s.eeg[0].length, W = 900, H = 300;
  for (let c = 0; c < C; c++) {
    let d = '';
    for (let t = 0; t < T; t++) {
      const x = t / (T - 1) * W;
      const y = H/2 - (s.eeg[t][c] + (c - C/2) * 4) * H / (C * 5);
      d += (t ? 'L' : 'M') + x.toFixed(1) + ',' + y.toFixed(1);
    }
    const hue = c * 45;
    svg.innerHTML += `<path d="${d}" fill="none" stroke="hsl(${hue},70%,60%)" stroke-width="1"/>`;
  }
}
fetch('/api/state').then(r => r.json()).then(render);
</script>
</body></html>
"""


class _State:
    def __init__(self):
        self.lock = threading.Lock()  # snapshot + engine-dict access
        self.build_lock = threading.Lock()  # serializes engine builds
        self.snapshot = common.Snapshot(status="Press Start to begin.")
        self.engines = {}  # (family, path, mtime) -> warmed engine


STATE = _State()

_ENGINE_CACHE_MAX = 8


def _resolve_engine(family: str, model_path):
    """Cached engine lookup, keyed by (family, checkpoint path, file
    mtime). The mtime key invalidates stale entries when a checkpoint is
    refit at the same path; the cache is LRU-bounded; manifest requests
    validate the requested family against the manifest's own model so a
    wrong-family request errors instead of silently serving (and caching)
    the wrong ensemble. Builds happen under a dedicated build lock —
    concurrent first requests serialize on the ~30 s XLA compile instead
    of duplicating it — while the snapshot lock is never held across a
    build."""
    import os

    path = str(model_path) if model_path else None
    mtime = None
    if path:
        try:
            mtime = os.path.getmtime(path)
        except OSError:
            pass  # missing file surfaces as the engine's own error below
    key = (family, path, mtime)
    with STATE.lock:
        engine = STATE.engines.get(key)
        if engine is not None:
            STATE.engines[key] = STATE.engines.pop(key)  # LRU touch
            return engine
    with STATE.build_lock:
        with STATE.lock:  # lost the race to another builder?
            engine = STATE.engines.get(key)
            if engine is not None:
                return engine
        if path and path.endswith(".json"):
            import json as _json
            from pathlib import Path as _Path

            from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

            manifest_model = _json.loads(_Path(path).read_text()).get(
                "model", "lstm"
            )
            if family and family != manifest_model:
                raise ValueError(
                    f"requested family {family!r} but manifest {path} "
                    f"serves model {manifest_model!r}"
                )
            engine = EnsembleEngine.from_manifest(path)
        else:
            from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
            from neural_speech_decoding_tpu.runtime.tester import default_model_path

            engine = InferenceEngine(
                path or default_model_path(),
                model=family,
                class_names=("Food", "Water", "None") if family == "lstm" else None,
            )
        with STATE.lock:
            STATE.engines[key] = engine
            while len(STATE.engines) > _ENGINE_CACHE_MAX:
                STATE.engines.pop(next(iter(STATE.engines)))
    return engine


class Handler(BaseHTTPRequestHandler):
    def _send(self, code: int, body: bytes, ctype: str = "application/json") -> None:
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # quiet
        pass

    def do_GET(self):
        if self.path in ("/", "/index.html"):
            self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
        elif self.path == "/api/state":
            with STATE.lock:
                body = json.dumps(STATE.snapshot.to_json_dict()).encode()
            self._send(200, body)
        else:
            self._send(404, b'{"error": "not found"}')

    def do_POST(self):
        if self.path == "/api/stream":
            self._handle_stream()
            return
        if self.path != "/api/decode":
            self._send(404, b'{"error": "not found"}')
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            mode = req.get("mode", "mock")
            if mode == "mock":
                snap = common.mock_snapshot(req.get("focus", common.CLASSES[0]))
            else:
                family = req.get("family", "lstm")
                model_path = req.get("model_path") or None
                engine = _resolve_engine(family, model_path)
                snap = common.decode_snapshot(
                    board_spec=req.get("board", "replay"),
                    speed=float(req.get("speed", 32.0)),
                    trials=int(req.get("trials", 10)),
                    model_path=None if engine is not None else model_path,
                    family=family,
                    engine=engine,
                )
            with STATE.lock:
                STATE.snapshot = snap
            self._send(200, json.dumps(snap.to_json_dict()).encode())
        except Exception as exc:  # surface the error to the page
            self._send(500, json.dumps({"error": str(exc), "status": f"failed: {exc}",
                                        "word_probs": {}, "eeg": None,
                                        "transcript": "", "stats_line": "",
                                        "timestamp": ""}).encode())

    def _handle_stream(self):
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length) or b"{}")
            family = req.get("family", "lstm")
            model_path = req.get("model_path") or None
            engine = _resolve_engine(family, model_path)

            from neural_speech_decoding_tpu.runtime.board import open_board
            from neural_speech_decoding_tpu.runtime.stream import StreamDecoder

            board = open_board(req.get("board", "replay"),
                               speed=float(req.get("speed", 32.0)))
            dec = StreamDecoder(
                engine,
                board,
                window_seconds=float(req.get("window_seconds", 5.0)),
                hop_seconds=float(req.get("hop_seconds", 1.0)),
                average_n=int(req.get("average_n", 10)),
            )
            preds, stats = dec.run(int(req.get("predictions", 10)),
                                   timeout=float(req.get("timeout", 120.0)))
            body = {
                "predictions": [
                    {
                        "index": p.index,
                        "label": p.label,
                        "probs": p.probs.tolist(),
                        "avg_probs": p.avg_probs.tolist(),
                        "latency_ms": (p.t_ready - p.t_window) * 1e3,
                    }
                    for p in preds
                ],
                "windows_per_second": stats.windows_per_second,
                "latency_p50_ms": stats.latency.percentile(50) * 1e3,
                "latency_p90_ms": stats.latency.percentile(90) * 1e3,
            }
            # logcov spectrum-guard counter (engine.stats) — degraded
            # windows are reported to the dashboard, not silently decoded
            engine_stats = getattr(engine, "stats", None)
            if isinstance(engine_stats, dict):
                body["guard_flagged"] = engine_stats.get("guard_flagged", 0)
            self._send(200, json.dumps(body).encode())
        except Exception as exc:
            self._send(500, json.dumps({"error": str(exc)}).encode())


def serve(port: int = 8777, warm_family: Optional[str] = "lstm"):
    """Start the dashboard server (blocking). Pre-warms the default engine
    so the first device snapshot doesn't pay the XLA compile."""
    if warm_family:
        try:
            _resolve_engine(warm_family, None).warmup([1])
        except Exception as exc:  # no checkpoint available — lazy path
            print(f"warmup skipped: {exc}")
    server = ThreadingHTTPServer(("127.0.0.1", port), Handler)
    print(f"dashboard: http://127.0.0.1:{port}")
    server.serve_forever()


def main():
    import argparse

    ap = argparse.ArgumentParser(description="TPU EEG decoding dashboard")
    ap.add_argument("--port", type=int, default=8777)
    ap.add_argument("--no-warmup", action="store_true")
    args = ap.parse_args()
    serve(args.port, warm_family=None if args.no_warmup else "lstm")


if __name__ == "__main__":
    main()
