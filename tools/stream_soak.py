"""Streaming soak: sustained hop-by-hop decode over an accelerated replay
board (VERDICT r4 #7).

Batch-1 compute is sub-millisecond (bench.py `batch1_compute_p50_ms`), so a
live session could decode every 1 s hop with ~1000x headroom — but nothing
demonstrated SUSTAINED streaming. This tool runs runtime/stream.py's
StreamDecoder for N hops on a replay board (the reference's own dataset at
`--speed`x real time) and records:

  * hop-to-probability latency (p50/p90/p99/max, window-complete on the
    host -> probabilities fetched) — the number the reference's >=50 s
    snapshot cadence is measured against
    (reference: Neuro-Alpha-App/Utilities/streaming_process.py:50-53),
  * hops missed while busy (drop-oldest semantics: the decoder waits for
    `hop` fresh samples; any extra board advance beyond one hop between
    consecutive predictions means the stream outran the decode loop),
  * engine guard stats (`guard_flagged` — logcov families flag windows
    whose covariance spectrum left the polynomial domain).

Through the dev tunnel every fetch pays ~24-29 ms HTTP round-trip, which
dominates the reported latency; `--rtt-calibrate` measures and reports the
empty-dispatch RTT alongside so the artifact separates transport from
compute (same methodology as bench.py).

  python tools/stream_soak.py --hops 10000 --speed 64 \
      --json checkpoints/stream_soak_r5.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def _fetch_rtt_ms(n: int = 20) -> float:
    import jax
    import jax.numpy as jnp

    noop = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((1, 3), jnp.float32)
    np.asarray(noop(z))
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        np.asarray(noop(z))
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples) * 1e3)


def soak(
    engine,
    name: str,
    hops: int,
    speed: float,
    hop_seconds: float,
    window_seconds: float,
    timeout: float,
) -> dict:
    from neural_speech_decoding_tpu.runtime.board import open_board
    from neural_speech_decoding_tpu.runtime.stream import StreamDecoder

    board = open_board("replay", speed=speed)
    dec = StreamDecoder(
        engine,
        board,
        window_seconds=window_seconds,
        hop_seconds=hop_seconds,
        average_n=10,
    )
    preds, stats = dec.run(hops, timeout=timeout)
    fs = board.get_sampling_rate(board.get_board_id())
    hop = max(1, int(hop_seconds * fs))
    counters = np.asarray([p.counter for p in preds], np.int64)
    deltas = np.diff(counters)
    # each prediction should follow the previous by exactly one hop of
    # fresh samples; extra advance = stream outran the decode loop
    missed = int(np.round(np.maximum(deltas - hop, 0) / hop).sum())
    lat = stats.latency.summary()
    labels, label_counts = np.unique(
        [p.label for p in preds], return_counts=True
    )
    return {
        "engine": name,
        "hops_decoded": int(stats.windows),
        "hops_requested": int(hops),
        "wall_seconds": round(stats.wall_seconds, 2),
        "decoded_per_second": round(stats.windows_per_second, 2),
        "replay_speed_x": speed,
        "hop_seconds": hop_seconds,
        "latency_ms": {
            k: round(v * 1e3, 3) if k != "count" else v
            for k, v in lat.items()
        },
        "hops_missed_while_busy": missed,
        "engine_stats": engine.stats,
        "label_histogram": {
            str(l): int(c) for l, c in zip(labels, label_counts)
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hops", type=int, default=10000)
    ap.add_argument("--speed", type=float, default=64.0)
    ap.add_argument("--hop-seconds", type=float, default=1.0)
    ap.add_argument("--window-seconds", type=float, default=5.0)
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument(
        "--engines", default="lstm,flagship",
        help="comma list: lstm (reference-parity .pth) and/or flagship "
             "(whitened logcov8 deployment member, guard stats live)",
    )
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
    from neural_speech_decoding_tpu.runtime.tester import default_model_path

    rows = []
    for name in args.engines.split(","):
        name = name.strip()
        if name == "lstm":
            engine = InferenceEngine(
                default_model_path(),
                model="lstm",
                class_names=("Food", "Water", "None"),
            )
        elif name == "flagship":
            manifest = json.loads(
                (REPO_ROOT / "checkpoints/logcov8w_deploy_manifest.json")
                .read_text()
            )
            engine = InferenceEngine(
                str(REPO_ROOT / manifest["members"][0]),
                model=manifest["model"],
                model_kw=manifest["config"].get("model_kw") or {},
            )
        else:
            raise SystemExit(f"unknown engine {name!r}")
        row = soak(
            engine, name, args.hops, args.speed, args.hop_seconds,
            args.window_seconds, args.timeout,
        )
        rows.append(row)
        print(json.dumps(row))

    out = {
        "tunnel_rtt_p50_ms": round(_fetch_rtt_ms(), 2),
        "device": __import__("jax").devices()[0].device_kind,
        "rows": rows,
    }
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
