import numpy as np
import pytest
import scipy.signal

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops.kuramoto import (
    kuramoto_operator,
    mai_filter,
    mai_filter_batch,
)


def numpy_reference_filter(window_tc: np.ndarray, lambd: float, renorm="diag"):
    """Independent float64 NumPy implementation of the reference semantics."""
    y = window_tc.astype(np.float64).T  # [C, T]
    phases = np.angle(scipy.signal.hilbert(y.T, axis=0))  # [T, C]
    diff = phases[:, :, None] - phases[:, None, :]
    p = np.sum(np.sin(diff) ** 2, axis=0)
    np.fill_diagonal(p, 0.0)
    if renorm == "diag":
        d = np.sqrt(np.clip(np.diag(p), 1e-12, None))
        p = p / np.outer(d, d)
    c = p.shape[0]
    inv = np.linalg.inv(np.eye(c) + lambd * (p.T @ p))
    return (inv @ y).T


def test_operator_matches_pair_loop():
    rng = np.random.default_rng(1)
    phases = rng.uniform(-np.pi, np.pi, size=(625, 8))
    ours = np.asarray(kuramoto_operator(phases))
    diff = phases[:, :, None] - phases[:, None, :]
    ref = np.sum(np.sin(diff) ** 2, axis=0)
    np.fill_diagonal(ref, 0.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)
    assert np.all(np.diag(ours) == 0.0)


@pytest.mark.parametrize("lambd", [1.25e-29, 1e-25])
def test_filter_matches_reference_f64(dataset, lambd):
    w = dataset.windows[3]
    ours = np.asarray(mai_filter(w, FilterConfig(lambd=lambd)))
    ref = numpy_reference_filter(w, lambd).astype(np.float32)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_filter_renorm_none(dataset):
    w = dataset.windows[0]
    cfg = FilterConfig(lambd=1e-4, renorm="none")
    ours = np.asarray(mai_filter(w, cfg))
    ref = numpy_reference_filter(w, 1e-4, renorm="none").astype(np.float32)
    np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)


def test_batch_matches_single(dataset):
    ws = dataset.windows[:6]
    cfg = FilterConfig()
    batched = np.asarray(mai_filter_batch(ws, cfg))
    singles = np.stack([np.asarray(mai_filter(w, cfg)) for w in ws])
    np.testing.assert_allclose(batched, singles, rtol=1e-6, atol=1e-6)


def test_fast_precision_close(dataset):
    """f32 throughput path stays within loose tolerance of f64."""
    w = dataset.windows[0]
    hi = np.asarray(mai_filter(w, FilterConfig(precision="highest")))
    fast = np.asarray(mai_filter(w, FilterConfig(precision="fast")))
    scale = np.abs(hi).max()
    assert np.abs(hi - fast).max() / scale < 5e-3
