import numpy as np
import pytest
import scipy.signal

from neural_speech_decoding_tpu.ops.hilbert import analytic_signal, instantaneous_phase


@pytest.mark.parametrize("n", [625, 624, 7, 8, 1024])
def test_analytic_signal_matches_scipy(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal((4, n))
    ours = np.asarray(analytic_signal(x, axis=-1))
    ref = scipy.signal.hilbert(x, axis=-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)


def test_phase_matches_scipy_axis0():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((625, 8))
    # our phase helper operates along any axis; reference uses axis=0
    ours = np.asarray(instantaneous_phase(x, axis=0))
    ref = np.angle(scipy.signal.hilbert(x, axis=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_phase_on_real_trial(dataset):
    x = dataset.windows[0].astype(np.float64)
    ours = np.asarray(instantaneous_phase(x, axis=0))
    ref = np.angle(scipy.signal.hilbert(x, axis=0))
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-8)


def test_matmul_hilbert_matches_fft():
    from neural_speech_decoding_tpu.ops.hilbert import analytic_signal_matmul

    rng = np.random.default_rng(3)
    x = rng.standard_normal((625, 8)).astype(np.float64)
    re, im = analytic_signal_matmul(x)
    ref = scipy.signal.hilbert(x, axis=0)
    np.testing.assert_allclose(np.asarray(re), ref.real, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(im), ref.imag, rtol=1e-9, atol=1e-9)


def test_matmul_hilbert_f32_accuracy():
    from neural_speech_decoding_tpu.ops.hilbert import analytic_signal_matmul

    rng = np.random.default_rng(4)
    x = rng.standard_normal((625, 8)).astype(np.float32)
    _, im = analytic_signal_matmul(x)
    ref = scipy.signal.hilbert(x.astype(np.float64), axis=0).imag
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(im) - ref).max() / scale < 1e-4
