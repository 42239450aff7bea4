import time

import numpy as np

from neural_speech_decoding_tpu.utils.timing import LatencyStats, Stopwatch


def test_latency_stats_percentiles():
    s = LatencyStats(name="x")
    for v in [0.01, 0.02, 0.03, 0.04, 0.10]:
        s.record(v)
    out = s.summary()
    assert out["count"] == 5
    assert out["min"] == 0.01
    assert out["max"] == 0.10
    assert out["p50"] == 0.03
    assert "p50" in str(s)


def test_latency_stats_empty():
    s = LatencyStats()
    assert s.summary() == {"count": 0}
    assert np.isnan(s.percentile(50))
    assert "no samples" in str(s)


def test_latency_stats_bounded():
    s = LatencyStats(max_samples=10)
    for i in range(100):
        s.record(i)
    assert s.count == 10


def test_stopwatch():
    w = Stopwatch()
    time.sleep(0.01)
    dt = w.lap()
    assert 0.005 < dt < 1.0
    assert w.lap() < dt


def test_device_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.utils.tracing import annotate, device_trace

    with device_trace(str(tmp_path / "tr")) as d:
        with annotate("little-matmul"):
            np.asarray(jax.jit(lambda x: x @ x)(jnp.ones((8, 8))))
    # trace files written
    assert any((tmp_path / "tr").rglob("*"))
