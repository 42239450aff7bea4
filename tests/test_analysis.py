"""Analysis tooling tests: metrics parity, robust IO, offline/realtime runs."""

import json
from pathlib import Path

import numpy as np
import pytest

from neural_speech_decoding_tpu.analysis.io import (
    detect_orientation,
    detect_unit_scale,
    read_numeric_csv,
)
from neural_speech_decoding_tpu.analysis.metrics import (
    compute_filter_metrics,
    format_metrics,
    save_metrics_json,
    snr_db,
)
from neural_speech_decoding_tpu.analysis.offline import analyze_file


def test_snr_methods():
    rng = np.random.default_rng(0)
    sig = rng.standard_normal(1000) * 2
    noise = rng.standard_normal(1000)
    v = snr_db(sig, noise, "power_ratio")
    assert 4 < v < 9  # ~6 dB for 2x amplitude
    assert snr_db(sig, np.zeros(10), "power_ratio") == float("inf")
    with pytest.raises(ValueError, match="unknown SNR method"):
        snr_db(sig, noise, "nope")


def test_metrics_schema_and_values():
    rng = np.random.default_rng(1)
    raw = rng.standard_normal((4, 500)) * 10
    filt = raw * 0.2  # strong suppression
    m = compute_filter_metrics(raw, filt, fs=125.0, channel=1, lambd=1e-30)
    assert m["channels"] == 4
    assert m["duration_sec"] == 4.0
    assert m["lambda"] == 1e-30
    imp = m["impact_channel"]
    assert imp["peak_after"] < imp["peak_before"]
    assert 90 < imp["artifact_variance_reduction_pct"] < 100
    assert m["tags_channel"]["artifact_suppression"]
    assert m["tags_channel"]["smoothing_effect"]
    assert format_metrics(m).startswith("[SNR")


def test_metrics_json_roundtrip(tmp_path):
    raw = np.ones((2, 100))
    raw[0, 50] = 100.0
    m = compute_filter_metrics(raw, raw * 0.5, fs=100.0)
    save_metrics_json(tmp_path / "m.json", m)
    back = json.loads((tmp_path / "m.json").read_text())
    assert back["impact_channel"]["peak_before"] == 100.0


def test_read_numeric_csv_with_header_and_index(tmp_path):
    p = tmp_path / "x.csv"
    p.write_text(
        "time,ch1,ch2\n"
        + "\n".join(f"{i},{i * 0.1:.3f},{i * 0.2:.3f}" for i in range(50))
    )
    arr = read_numeric_csv(p)
    assert arr.shape == (50, 2)  # header skipped, index column dropped
    np.testing.assert_allclose(arr[:, 0], np.arange(50) * 0.1, atol=1e-9)


def test_read_numeric_csv_rejects_garbage(tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("hello\nworld\n")
    with pytest.raises(ValueError, match="no numeric rows"):
        read_numeric_csv(p)


def test_detect_orientation():
    assert detect_orientation(np.zeros((8, 625))).shape == (8, 625)
    assert detect_orientation(np.zeros((625, 8))).shape == (8, 625)


def test_detect_unit_scale():
    uv = np.full((2, 100), 20.0)
    assert detect_unit_scale(uv) == (1.0, "microvolts")
    volts = uv * 1e-6
    scale, name = detect_unit_scale(volts)
    assert name == "volts" and scale == 1e6
    nv = uv * 1e3
    scale, name = detect_unit_scale(nv)
    assert name == "nanovolts"


def test_analyze_file_end_to_end(tmp_path, data_dir, dataset):
    src = data_dir / dataset.files[0]
    metrics, filtered = analyze_file(
        src, lambd=1e-29, fs=125.0, out_dir=tmp_path
    )
    assert metrics["channels"] == 8
    assert filtered.shape == (8, 625)
    outs = list(tmp_path.iterdir())
    assert any("filtered" in p.name for p in outs)
    assert any("metrics" in p.name for p in outs)


def test_realtime_analysis_with_injection():
    from neural_speech_decoding_tpu.analysis.realtime import run_realtime
    from neural_speech_decoding_tpu.runtime.board import SyntheticBoard

    board = SyntheticBoard(speed=64.0)
    board.prepare_session()
    board.start_stream(5000)
    try:
        results = run_realtime(
            board, n_windows=3, window_seconds=1.0, inject="sine", timeout=60
        )
    finally:
        board.stop_stream()
        board.release_session()
    assert len(results) == 3
    for m in results:
        assert m["duration_sec"] == 1.0
        assert np.isfinite(m["impact_channel"]["peak_before"])


REFERENCE_EDF = Path(
    "/root/reference/Neuro-Alpha-App/Utilities/MindsAI/examples/data/eeg.edf"
)
REFERENCE_EDF_METRICS = Path(
    "/root/reference/Neuro-Alpha-App/Utilities/MindsAI/examples/data/"
    "data_mai_metrics_1e-34_20251017T030538.json"
)


def _need_reference_edf():
    if not REFERENCE_EDF.is_file():
        pytest.skip("reference eeg.edf not mounted")


def test_edf_reader_parses_reference_file():
    """Stdlib EDF reader on the reference's shipped recording: header
    geometry must match the shipped metrics JSON (26 ch, 500 Hz, 120 s)."""
    _need_reference_edf()
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    sig, fs = read_edf_numeric(REFERENCE_EDF)
    assert sig.shape == (26, 60000)
    assert fs == 500.0
    assert sig.dtype == np.float64


def test_edf_reader_rejects_junk(tmp_path):
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    bad = tmp_path / "junk.edf"
    bad.write_bytes(b"not an edf at all")
    with pytest.raises(ValueError):
        read_edf_numeric(bad)


def test_edf_workflow_reproduces_reference_metrics_json():
    """End-to-end golden test of the reference's own EDF analysis output:
    EDF intake -> unit detect -> mean detrend -> Kuramoto filter
    (lambda=1e-34) -> metrics must reproduce the metrics JSON the reference
    ships next to eeg.edf (produced by its Tk offline tool on channel 4)."""
    _need_reference_edf()
    import json

    from neural_speech_decoding_tpu.analysis.offline import analyze_file

    ref = json.loads(REFERENCE_EDF_METRICS.read_text())
    metrics, filtered = analyze_file(
        REFERENCE_EDF, lambd=1e-34, channel=4, snr_method="power_ratio"
    )
    assert metrics["fs_hz"] == ref["fs_hz"]
    assert metrics["channels"] == ref["channels"]
    assert metrics["duration_sec"] == ref["duration_sec"]
    assert metrics["snr_db_channel"] == pytest.approx(
        ref["snr_db_channel"], abs=1e-6
    )
    ours_i, ref_i = metrics["impact_channel"], ref["impact_channel"]
    assert ours_i["peak_before"] == pytest.approx(ref_i["peak_before"], abs=1e-9)
    assert ours_i["peak_after"] == pytest.approx(ref_i["peak_after"], rel=1e-6)
    assert ours_i["median_shift"] == pytest.approx(ref_i["median_shift"], abs=1e-6)
    assert ours_i["artifact_variance_reduction_pct"] == pytest.approx(
        ref_i["artifact_variance_reduction_pct"], abs=1e-6
    )
    assert metrics["tags_channel"] == ref["tags_channel"]
    assert metrics["thresholds"] == ref["thresholds"]
    assert filtered.shape == (26, 60000)


def _make_edf(
    path,
    n_records=4,
    record_seconds=1.0,
    signals=(("C1", 100, -500.0, 500.0, -32768, 32767, "uV"),),
    with_annotations=False,
    truncate_bytes=0,
):
    """Build a minimal valid EDF file from scratch (fixed-layout ASCII
    header + int16 LE records)."""
    sigs = list(signals)
    if with_annotations:
        sigs.append(("EDF Annotations", 10, -1.0, 1.0, -32768, 32767, ""))
    ns = len(sigs)

    def f(text, width):
        return str(text)[:width].ljust(width).encode("ascii")

    header = b"".join([
        f("0", 8), f("patient", 80), f("recording", 80),
        f("01.01.26", 8), f("00.00.00", 8),
        f(256 + 256 * ns, 8), f("", 44), f(n_records, 8),
        f(record_seconds, 8), f(ns, 4),
    ])
    per = b""
    fields = [
        (16, [s[0] for s in sigs]),            # label
        (80, ["" for s in sigs]),              # transducer
        (8, [s[6] for s in sigs]),             # phys dim
        (8, [s[2] for s in sigs]),             # phys min
        (8, [s[3] for s in sigs]),             # phys max
        (8, [s[4] for s in sigs]),             # dig min
        (8, [s[5] for s in sigs]),             # dig max
        (80, ["" for s in sigs]),              # prefiltering
        (8, [s[1] for s in sigs]),             # samples per record
        (32, ["" for s in sigs]),              # reserved
    ]
    for width, vals in fields:
        for v in vals:
            per += f(v, width)

    rng = np.random.default_rng(0)
    records = b""
    digital = {}
    for r in range(n_records):
        for si, s in enumerate(sigs):
            n = s[1]
            dig = rng.integers(-30000, 30000, size=n, dtype=np.int16)
            digital.setdefault(si, []).append(dig)
            records += dig.astype("<i2").tobytes()
    data = header + per + records
    if truncate_bytes:
        data = data[:-truncate_bytes]
    Path(path).write_bytes(data)
    return {k: np.concatenate(v) for k, v in digital.items()}


def test_edf_synthetic_roundtrip(tmp_path):
    """Physical-value conversion matches the EDF spec formula exactly."""
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    p = tmp_path / "synth.edf"
    digital = _make_edf(p, signals=(
        ("C1", 100, -500.0, 500.0, -32768, 32767, "uV"),
        ("C2", 100, 0.0, 1000.0, 0, 1000, "uV"),
    ))
    sig, fs = read_edf_numeric(p)
    assert sig.shape == (2, 400) and fs == 100.0
    for i, (pmin, pmax, dmin, dmax) in enumerate(
        [(-500.0, 500.0, -32768, 32767), (0.0, 1000.0, 0, 1000)]
    ):
        gain = (pmax - pmin) / (dmax - dmin)
        expect = digital[i].astype(np.float64) * gain + (pmin - gain * dmin)
        np.testing.assert_allclose(sig[i], expect, rtol=0, atol=0)


def test_edf_skips_annotation_channels(tmp_path):
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    p = tmp_path / "annot.edf"
    _make_edf(p, with_annotations=True)
    sig, fs = read_edf_numeric(p)
    assert sig.shape == (1, 400)  # annotation channel excluded
    assert fs == 100.0


def test_edf_rejects_mixed_rates(tmp_path):
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    p = tmp_path / "mixed.edf"
    _make_edf(p, signals=(
        ("C1", 100, -500.0, 500.0, -32768, 32767, "uV"),
        ("C2", 50, -500.0, 500.0, -32768, 32767, "uV"),
    ))
    with pytest.raises(ValueError, match="mixed sampling rates"):
        read_edf_numeric(p)


def test_edf_drops_truncated_final_record(tmp_path):
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    p = tmp_path / "trunc.edf"
    _make_edf(p, truncate_bytes=10)  # chop into the last record
    sig, fs = read_edf_numeric(p)
    assert sig.shape == (1, 300)  # 3 complete records survive


def test_edf_rejects_zero_duration_records(tmp_path):
    from neural_speech_decoding_tpu.analysis.io import read_edf_numeric

    p = tmp_path / "zerodur.edf"
    _make_edf(p, record_seconds=0)
    with pytest.raises(ValueError, match="zero-duration"):
        read_edf_numeric(p)
