"""Fair accuracy comparison: reference checkpoint vs our model families.

All models are evaluated on the SAME held-out stratified split (seed 0,
20%) of the shipped dataset, with the production preprocessing. Note the
reference checkpoint was trained on (a superset of) these trials, so its
number is optimistic — ours are honest held-out accuracy.

  python tools/eval_models.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax

from neural_speech_decoding_tpu.config import (
    FIVE_CLASS_PREFIXES,
    FilterConfig,
)
from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
from neural_speech_decoding_tpu.io.dataset import load_trials
from neural_speech_decoding_tpu.io.params_io import load_params_npz
from neural_speech_decoding_tpu.models.registry import get_model
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch

REFERENCE_CKPT = (
    "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
    "lstm_classifier_Water_Food_Bg_Noise.pth"
)


def evaluate(spec_name: str, params, windows, labels) -> float:
    spec = get_model(spec_name)
    logits = np.asarray(
        jax.jit(lambda p, x: spec.apply(p, x, train=False))(params, windows)
    )
    return float((logits.argmax(1) == labels).mean())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--val-fraction", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    fcfg = FilterConfig(precision="fast")
    results = {}

    ds3 = load_trials()
    _, val3 = ds3.split(args.val_fraction, seed=args.seed)
    x3 = np.asarray(mai_filter_batch(val3.windows, fcfg))
    y3 = val3.labels

    ref = load_decoder_params(REFERENCE_CKPT)
    results["reference_lstm (trained on full set, incl. this split)"] = evaluate(
        "lstm", ref, x3, y3
    )

    for name, path in [
        ("lstm", "checkpoints/lstm3_retrained.npz"),
        ("eegnet", "checkpoints/eegnet3.npz"),
        ("eegnet", "checkpoints/eegnet3_aug.npz"),
        ("eegnet", "checkpoints/eegnet3_best.npz"),
        ("transformer", "checkpoints/transformer3.npz"),
        ("transformer", "checkpoints/transformer3_aug.npz"),
        ("transformer", "checkpoints/transformer3_best.npz"),
        ("tcn", "checkpoints/tcn3_best.npz"),
        ("tcn", "checkpoints/tcn3_cosine.npz"),
        ("eegnet", "checkpoints/eegnet3_cosine.npz"),
    ]:
        p = REPO_ROOT / path
        if not p.is_file():
            continue
        params = load_params_npz(p)
        results[f"{name} ({p.name})"] = evaluate(name, params, x3, y3)

    ds5 = load_trials(class_prefixes=FIVE_CLASS_PREFIXES)
    _, val5 = ds5.split(args.val_fraction, seed=args.seed)
    x5 = np.asarray(mai_filter_batch(val5.windows, fcfg))
    y5 = val5.labels
    for name5, path5 in [("lstm5", "checkpoints/lstm5.npz"),
                         ("lstm5", "checkpoints/lstm5_best.npz"),
                         ("eegnet5", "checkpoints/eegnet5_best.npz"),
                         ("transformer5", "checkpoints/transformer5_best.npz"),
                         ("tcn5", "checkpoints/tcn5_best.npz")]:
        p5 = REPO_ROOT / path5
        if p5.is_file():
            results[f"{name5} (5-class, {p5.name})"] = evaluate(
                name5, load_params_npz(p5), x5, y5
            )

    width = max(len(k) for k in results)
    print(f"{'model':<{width}}  val_acc")
    for k, v in results.items():
        print(f"{k:<{width}}  {v:.3f}")
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
