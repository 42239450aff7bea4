import numpy as np
import pytest
import scipy.signal

from neural_speech_decoding_tpu.ops.iir import (
    butter_sos,
    collector_filter_chain,
    collector_filter_chain_batch,
    detrend_constant,
    sosfilt,
    sosfiltfilt,
)


@pytest.fixture
def noise():
    rng = np.random.default_rng(0)
    return rng.standard_normal((625, 8))


@pytest.mark.parametrize(
    "kind,order,lo,hi",
    [
        ("bandpass", 2, 3.0, 48.0),
        ("bandstop", 4, 49.5, 50.5),
        ("lowpass", 4, 0.0, 30.0),
        ("highpass", 3, 1.0, 0.0),
    ],
)
def test_design_matches_scipy(kind, order, lo, hi):
    ours = np.asarray(butter_sos(kind, order, lo, hi, 125.0))
    if kind in ("bandpass", "bandstop"):
        wn = (lo, hi)
    elif kind == "lowpass":
        wn = hi
    else:
        wn = lo
    ref = scipy.signal.butter(order, wn, btype=kind, fs=125.0, output="sos")
    np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_sosfilt_matches_scipy(noise):
    sos = butter_sos("bandpass", 2, 3.0, 48.0, 125.0)
    ours = np.asarray(sosfilt(sos, noise))
    ref = scipy.signal.sosfilt(np.asarray(sos), noise, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_sosfiltfilt_matches_scipy(noise):
    sos = butter_sos("bandstop", 4, 59.0, 61.0, 125.0)
    ours = np.asarray(sosfiltfilt(sos, noise))
    ref = scipy.signal.sosfiltfilt(np.asarray(sos), noise, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-8)


def test_sosfiltfilt_no_padding_is_forward_backward(noise):
    sos = butter_sos("bandpass", 2, 3.0, 48.0, 125.0)
    ours = np.asarray(sosfiltfilt(sos, noise, padtype=None))
    fwd = scipy.signal.sosfilt(np.asarray(sos), noise, axis=0)
    ref = scipy.signal.sosfilt(np.asarray(sos), fwd[::-1], axis=0)[::-1]
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-9)


def test_detrend():
    x = np.random.default_rng(1).standard_normal((100, 4)) + 7.5
    out = np.asarray(detrend_constant(x))
    np.testing.assert_allclose(out.mean(axis=0), 0.0, atol=1e-12)


def test_collector_chain_suppresses_line_noise():
    """60 Hz mains + 40 Hz artifact injected on a 10 Hz signal must be
    crushed; the 10 Hz content must survive."""
    fs = 125.0
    t = np.arange(625) / fs
    base = np.sin(2 * np.pi * 10 * t)
    mains = 3.0 * np.sin(2 * np.pi * 60 * t)
    forty = 2.0 * np.sin(2 * np.pi * 40 * t)
    x = np.stack([base + mains + forty] * 8, axis=1)
    y = np.asarray(collector_filter_chain(x, fs))

    def band_power(sig, f):
        spec = np.abs(np.fft.rfft(sig))
        idx = int(round(f * len(sig) / fs))
        return spec[idx - 1 : idx + 2].max()

    sig = y[:, 0]
    assert band_power(sig, 10) > 0.5 * band_power(base, 10)
    assert band_power(sig, 60) < 0.02 * band_power(mains + base, 60)
    assert band_power(sig, 40) < 0.05 * band_power(forty + base, 40)


def test_collector_chain_batch(noise):
    batch = np.stack([noise, noise * 2])
    out = np.asarray(collector_filter_chain_batch(batch))
    single = np.asarray(collector_filter_chain(noise))
    np.testing.assert_allclose(out[0], single, rtol=1e-8, atol=1e-8)
    np.testing.assert_allclose(out[1], 2 * single, rtol=1e-7, atol=1e-7)


def test_padlen_too_long_raises():
    sos = butter_sos("bandpass", 2, 3.0, 48.0, 125.0)
    with pytest.raises(ValueError, match="padlen"):
        sosfiltfilt(sos, np.zeros((10, 2)), padlen=10)


@pytest.mark.slow
def test_sosfilt_parallel_matches_scan(noise):
    from neural_speech_decoding_tpu.ops.iir import sosfilt_parallel

    sos = butter_sos("bandpass", 2, 3.0, 48.0, 125.0)
    ref = scipy.signal.sosfilt(np.asarray(sos), noise, axis=0)
    ours = np.asarray(sosfilt_parallel(sos, noise))
    np.testing.assert_allclose(ours, ref, rtol=1e-7, atol=1e-8)


@pytest.mark.slow
def test_sosfiltfilt_parallel_matches_scipy(noise):
    from neural_speech_decoding_tpu.ops.iir import sosfiltfilt_parallel

    sos = butter_sos("bandstop", 4, 59.0, 61.0, 125.0)
    ours = np.asarray(sosfiltfilt_parallel(sos, noise))
    ref = scipy.signal.sosfiltfilt(np.asarray(sos), noise, axis=0)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-7)


@pytest.mark.slow
def test_collector_chain_parallel_matches_scan(noise):
    batch = np.stack([noise, noise * 0.5]).astype(np.float32)
    a = np.asarray(collector_filter_chain_batch(batch, method="scan"))
    b = np.asarray(collector_filter_chain_batch(batch, method="parallel"))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 1e-4


def test_collector_chain_matmul_matches_scan(noise):
    batch = np.stack([noise, noise * 0.5]).astype(np.float32)
    a = np.asarray(collector_filter_chain_batch(batch, method="scan"))
    b = np.asarray(collector_filter_chain_batch(batch, method="matmul"))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 1e-4


def test_collector_chain_matmul_padfree(noise):
    batch = noise[None].astype(np.float32)
    a = np.asarray(collector_filter_chain_batch(batch, padtype=None, method="scan"))
    b = np.asarray(collector_filter_chain_batch(batch, padtype=None, method="matmul"))
    scale = np.abs(a).max()
    assert np.abs(a - b).max() / scale < 1e-4
