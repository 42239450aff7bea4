"""Raw-vs-filtered trial visualization.

Headless equivalent of the reference's manual check notebook (reference:
Data_Visualization_Check.ipynb): load a trial CSV, overlay raw and
Kuramoto-filtered traces per channel, save a PNG.

  python examples/visualize_trials.py [--trial food] [--lambda 1e-29] [--out viz.png]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.io.dataset import load_trials
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--trial", default="food", help="class prefix to plot")
    ap.add_argument("--lambda", dest="lambd", type=float, default=1e-29)
    ap.add_argument("--out", default="trial_visualization.png")
    args = ap.parse_args()

    ds = load_trials(args.data_dir)
    idx = next(
        (i for i, f in enumerate(ds.files) if f.startswith(args.trial)), 0
    )
    raw = ds.windows[idx]  # [T, C]
    filt = np.asarray(mai_filter(raw, FilterConfig(lambd=args.lambd)))

    t = np.arange(raw.shape[0]) / 125.0
    c = raw.shape[1]
    fig, axes = plt.subplots(c, 1, figsize=(12, 1.6 * c), sharex=True)
    for ch in range(c):
        ax = axes[ch]
        ax.plot(t, raw[:, ch], lw=0.6, alpha=0.6, label="raw")
        ax.plot(t, filt[:, ch], lw=0.6, label="filtered")
        ax.set_ylabel(f"Ch {ch + 1}\n(uV)", fontsize=8)
        if ch == 0:
            ax.legend(loc="upper right", fontsize=8)
            ax.set_title(f"{ds.files[idx]} — lambda={args.lambd:g}")
    axes[-1].set_xlabel("time (s)")
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
