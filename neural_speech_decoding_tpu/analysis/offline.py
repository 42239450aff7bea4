"""Offline filter analysis CLI — headless equivalent of the reference's Tk
offline demo (reference: MindsAI/examples/Minds_AI_Filter_Offline_Signal_
Analysis.py): robust intake -> detrend -> Kuramoto filter -> SNR/impact
metrics -> filtered CSV + metrics JSON export.

  python -m neural_speech_decoding_tpu.analysis.offline data.csv \
      --lambda 1e-34 --channel 0 --fs 500 --out-dir out/
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from neural_speech_decoding_tpu.analysis.io import (
    detect_orientation,
    detect_unit_scale,
    read_edf_numeric,
    read_numeric_csv,
)
from neural_speech_decoding_tpu.analysis.metrics import (
    compute_filter_metrics,
    format_metrics,
    save_metrics_json,
)
from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter


def analyze_file(
    path,
    lambd: float = 1e-25,
    channel: int = 0,
    fs: float = 125.0,
    snr_method: str = "power_ratio",
    out_dir=None,
):
    """Run the offline analysis over one CSV or EDF file.

    Returns (metrics, filtered [C, T]). For EDF input the header sampling
    rate overrides the `fs` argument (reference: the Tk tool prefills fs
    from the EDF header, Minds_AI_Filter_Offline_Signal_Analysis.py:786-793).
    """
    if str(path).lower().endswith(".edf"):
        data_ct, edf_fs = read_edf_numeric(path)
        fs = edf_fs  # the header is authoritative for EDF
    else:
        arr = read_numeric_csv(path)
        data_ct = detect_orientation(arr)
    scale, unit = detect_unit_scale(data_ct)
    data_uv = data_ct * scale
    # mean detrend per channel (reference behavior)
    raw = data_uv - data_uv.mean(axis=1, keepdims=True)

    import jax

    cfg = FilterConfig(lambd=lambd)
    # f64 when x64 is on (the fidelity path); jax downcasts to f32 otherwise
    filtered_tc = np.asarray(jax.jit(lambda x: mai_filter(x, cfg))(raw.T))
    filtered = filtered_tc.T.astype(np.float64)

    metrics = compute_filter_metrics(
        raw, filtered, fs=fs, channel=channel, method=snr_method, lambd=lambd
    )
    metrics["detected_unit"] = unit

    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        stamp = time.strftime("%Y%m%dT%H%M%S")
        stem = Path(path).stem
        np.savetxt(
            out_dir / f"{stem}_mai_filtered_{lambd:g}_{stamp}.csv",
            filtered.T,
            delimiter=",",
            fmt="%.7f",
        )
        save_metrics_json(
            out_dir / f"{stem}_mai_metrics_{lambd:g}_{stamp}.json", metrics
        )
    return metrics, filtered


def main() -> None:
    ap = argparse.ArgumentParser(description="Offline Kuramoto-filter analysis")
    ap.add_argument("path")
    ap.add_argument("--lambda", dest="lambd", type=float, default=1e-25)
    ap.add_argument("--channel", type=int, default=0)
    ap.add_argument("--fs", type=float, default=125.0)
    ap.add_argument("--snr-method", default="power_ratio",
                    choices=("power_ratio", "variance_ratio", "amplitude_ratio"))
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    metrics, _ = analyze_file(
        args.path, lambd=args.lambd, channel=args.channel, fs=args.fs,
        snr_method=args.snr_method, out_dir=args.out_dir,
    )
    print(format_metrics(metrics))


if __name__ == "__main__":
    main()
