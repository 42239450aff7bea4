"""Generate golden reference outputs from the shipped PyTorch checkpoint.

Runs the *reference semantics* — float64 scipy Hilbert + pairwise-desynchrony
spatial filter, then the torch LSTM/attention decoder in eval mode — over
every trial CSV, and stores logits + probabilities to
tests/golden/reference_probs.npz. The fidelity tests compare our JAX
pipeline against this dump (target: <=1e-4 logit delta; SURVEY.md §6).

Covers ALL 324 shipped trials by default (BASELINE.md names all of
EEG_data_collection): fidelity is label-free, so the yes/no trials are
145 extra real-signal test vectors even though the shipped checkpoint is
3-class. `labels` are 5-class prefix indices (config.FIVE_CLASS_PREFIXES);
the reported "reference accuracy" is meaningful only for --classes three.

This is an independent re-implementation of the published behavior
(reference: MindsAI/mindsai_filter_python/core.py, lstm_eeg_model.py), used
only to produce test fixtures. Requires torch (available in the dev image),
which the framework itself does not.

Usage: python tools/make_golden.py [--data-dir DIR] [--ckpt PTH] [--out NPZ]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np
from scipy.signal import hilbert

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from neural_speech_decoding_tpu.io.dataset import load_trials  # noqa: E402

DEFAULT_CKPT = (
    "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
    "lstm_classifier_Water_Food_Bg_Noise.pth"
)
LAMBDA = 1.25e-29  # production tailoring lambda (reference: tester.py:84)


def reference_mai_filter(window_tc: np.ndarray, lambd: float = LAMBDA) -> np.ndarray:
    """Reference-semantics spatial filter in float64, [T, C] -> [T, C] f32."""
    y = window_tc.astype(np.float64).T  # [C, T], filter core orientation
    phases = np.angle(hilbert(y.T, axis=0))  # [T, C]
    # Pairwise desynchrony via broadcasting (reference uses a pair loop).
    diff = phases[:, :, None] - phases[:, None, :]  # [T, C, C]
    p = np.sum(np.sin(diff) ** 2, axis=0)
    np.fill_diagonal(p, 0.0)
    d = np.sqrt(np.clip(np.diag(p), 1e-12, None))
    p = p / np.outer(d, d)
    c = p.shape[0]
    inv = np.linalg.inv(np.eye(c) + lambd * (p.T @ p))
    return (inv @ y).T.astype(np.float32)


def build_torch_model(ckpt_path: str):
    import torch
    import torch.nn as nn

    class RefDecoder(nn.Module):
        def __init__(self, in_size=8, hidden=48, layers=2, classes=3, p=0.60):
            super().__init__()
            self.lstm = nn.LSTM(in_size, hidden, layers, batch_first=True, dropout=p)
            self.ln = nn.LayerNorm(hidden)
            self.attn = nn.Linear(hidden, 1)
            self.fc = nn.Sequential(
                nn.Linear(hidden, 32), nn.RReLU(), nn.Dropout(p), nn.Linear(32, classes)
            )

        def forward(self, x):
            seq, _ = self.lstm(x)
            w = torch.softmax(self.attn(seq).squeeze(-1), dim=1)
            pooled = (seq * w.unsqueeze(-1)).sum(dim=1)
            return self.fc(self.ln(pooled))

    model = RefDecoder()
    state = torch.load(ckpt_path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    model.load_state_dict(state, strict=True)
    model.eval()
    return model


def main() -> None:
    from neural_speech_decoding_tpu.config import (
        FIVE_CLASS_PREFIXES,
        THREE_CLASS_PREFIXES,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--ckpt", default=DEFAULT_CKPT)
    ap.add_argument("--out", default=str(REPO_ROOT / "tests/golden/reference_probs.npz"))
    ap.add_argument(
        "--classes", choices=("three", "five"), default="five",
        help="trial prefixes to include: 'five' = all 324 shipped trials "
             "(the BASELINE.md fidelity universe), 'three' = the 179 the "
             "production model was trained on",
    )
    args = ap.parse_args()

    import torch

    prefixes = (
        FIVE_CLASS_PREFIXES if args.classes == "five" else THREE_CLASS_PREFIXES
    )
    ds = load_trials(args.data_dir, class_prefixes=prefixes)
    model = build_torch_model(args.ckpt)

    filtered = np.stack([reference_mai_filter(w) for w in ds.windows])
    with torch.inference_mode():
        logits = model(torch.from_numpy(filtered)).numpy()
        probs = torch.softmax(torch.from_numpy(logits), dim=-1).numpy()

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        out,
        files=np.array(ds.files),
        labels=ds.labels,
        logits=logits.astype(np.float32),
        probs=probs.astype(np.float32),
        filtered_checksum=np.float64(np.abs(filtered).sum()),
    )
    pred = probs.argmax(axis=1)
    acc = float((pred == ds.labels).mean())
    print(f"wrote {out} — {len(ds)} trials, reference accuracy {acc:.4f}")


if __name__ == "__main__":
    main()
