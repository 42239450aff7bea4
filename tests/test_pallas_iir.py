"""Fused IIR preprocessing kernel tests (interpret mode on CPU)."""

import numpy as np
import pytest
import scipy.signal

from neural_speech_decoding_tpu.ops.pallas.iir import (
    _stack_sos,
    collector_stages,
    fused_preprocess,
)


def scipy_combined_filtfilt(x_btc: np.ndarray, stages) -> np.ndarray:
    """Reference semantics of the fused kernel: detrend, ALL sections
    forward, then ALL sections backward (no padding)."""
    sos = _stack_sos(stages)
    x = x_btc - x_btc.mean(axis=1, keepdims=True)
    fwd = scipy.signal.sosfilt(sos, x, axis=1)
    return scipy.signal.sosfilt(sos, fwd[:, ::-1, :], axis=1)[:, ::-1, :]


@pytest.fixture
def batch():
    rng = np.random.default_rng(0)
    return (rng.standard_normal((3, 625, 8)) * 5 + 2).astype(np.float32)


def test_fused_matches_scipy_composite(batch):
    stages = collector_stages()
    ours = np.asarray(
        fused_preprocess(batch, stages, block_n=1, block_t=125, interpret=True)
    )
    ref = scipy_combined_filtfilt(batch.astype(np.float64), stages)
    scale = np.abs(ref).max()
    assert np.abs(ours - ref).max() / scale < 1e-4


def test_fused_chunked_matches_unchunked(batch):
    stages = collector_stages()
    a = np.asarray(
        fused_preprocess(batch, stages, block_n=1, block_t=625, interpret=True)
    )
    b = np.asarray(
        fused_preprocess(batch, stages, block_n=1, block_t=125, interpret=True)
    )
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_fused_zscore(batch):
    stages = collector_stages()[:1]
    out = np.asarray(
        fused_preprocess(batch, stages, zscore=True, block_n=1,
                         block_t=125, interpret=True)
    )
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=1), 1.0, atol=1e-2)


def test_fused_suppresses_line_noise():
    fs = 125.0
    t = np.arange(625) / fs
    base = np.sin(2 * np.pi * 10 * t)
    mains = 3.0 * np.sin(2 * np.pi * 60 * t)
    x = np.stack([base + mains] * 8, axis=1)[None].astype(np.float32)
    y = np.asarray(
        fused_preprocess(x, collector_stages(), block_n=1, block_t=125,
                         interpret=True)
    )[0, :, 0]

    spec = np.abs(np.fft.rfft(y))
    f = np.fft.rfftfreq(625, 1 / fs)
    p10 = spec[np.argmin(np.abs(f - 10))]
    p60 = spec[np.argmin(np.abs(f - 60))]
    assert p60 < 0.01 * p10
