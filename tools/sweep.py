"""Model-selection sweep: grid of configurations -> nested K-fold CV each
-> ranked table -> optionally train the winner on the full dataset and save
its checkpoint.

The reference lost its trainer notebook and published an accuracy claim
with no protocol (reference: readme.md:52, .MISSING_LARGE_BLOBS:1); this is
the principled replacement workflow: every candidate is scored with nested
epoch selection (tools/crossval.py), the comparison is ranked on the
unbiased column, and only then is a deployment checkpoint fit on all data.

  python tools/sweep.py --grid default --folds 5 --out checkpoints/sweep.json
  python tools/sweep.py --grid default --train-winner checkpoints/winner.npz
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from crossval import run_crossval  # noqa: E402  (tools/ sibling import)

# Named grids: lists of axis dicts expanded as a cross product.
GRIDS = {
    # the round-2 exploration grid over the strongest family
    "default": {
        "model": ["tcn", "tcn_small", "tcn_wide"],
        "augment": [0.5, 1.0],
        "aug_kinds": ["all"],
    },
    # quick smoke grid (CI-sized)
    "smoke": {
        "model": ["lstm"],
        "augment": [0.0],
        "epochs": [2],
        "folds": [2],
    },
    # the accuracy-flagship family: model_kw axes sweep config fields the
    # registry exposes through get_model(**kw)
    "logcov": {
        "model": ["logcov8"],
        "model_kw": [
            {},
            {"dropout": 0.0},
            {"whiten": True, "dropout": 0.0},
        ],
        "augment": [0.5],
    },
}


def expand(grid: dict) -> list[dict]:
    keys = sorted(grid)
    return [dict(zip(keys, vals)) for vals in itertools.product(*(grid[k] for k in keys))]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="default", choices=sorted(GRIDS))
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--out", default=None, help="summary JSON path")
    ap.add_argument(
        "--train-winner", default=None,
        help="after the sweep, train the best config on ALL data and save "
             "its params to this .npz",
    )
    args = ap.parse_args()

    results = []
    combos = expand(GRIDS[args.grid])
    for i, combo in enumerate(combos):
        cfg = {"folds": args.folds, "epochs": args.epochs, **combo}
        print(f"[{i + 1}/{len(combos)}] {cfg}", flush=True)
        summary = run_crossval(verbose=False, **cfg)
        row = summary["by_protocol"]["nested"]
        print(f"    nested {row['mean']:.3f} ± {row['std']:.3f}", flush=True)
        results.append(summary)

    results.sort(key=lambda s: -s["by_protocol"]["nested"]["mean"])
    print("\nrank  nested        last          biased        config")
    for s in results:
        by = s["by_protocol"]
        print(
            f"  {by['nested']['mean']:.3f}±{by['nested']['std']:.3f}  "
            f"{by['last']['mean']:.3f}±{by['last']['std']:.3f}  "
            f"{by['biased']['mean']:.3f}±{by['biased']['std']:.3f}  "
            f"{s['model']} {s['config']}"
        )
    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))

    if args.train_winner:
        best = results[0]
        print(f"\ntraining winner on the full dataset: {best['model']} "
              f"{best['config']}")
        from neural_speech_decoding_tpu.config import FIVE_CLASS_PREFIXES
        from neural_speech_decoding_tpu.io.dataset import load_trials
        from neural_speech_decoding_tpu.io.params_io import save_params_npz
        from neural_speech_decoding_tpu.models.registry import get_model
        from neural_speech_decoding_tpu.train.loop import TrainConfig, train

        cfg = best["config"]
        model_kw = cfg.get("model_kw") or {}
        spec = get_model(best["model"], **model_kw)
        if len(spec.class_names) == 5:
            ds = load_trials(class_prefixes=FIVE_CLASS_PREFIXES)
        else:
            ds = load_trials()
        train_cfg = TrainConfig(
            learning_rate=cfg["lr"], epochs=cfg["epochs"], batch_size=32,
            label_smoothing=cfg["label_smoothing"], seed=cfg["seed"],
            schedule=cfg["schedule"], augment_prob=cfg["augment"],
            augment_kinds=cfg["aug_kinds"],
            # deployment fit: fixed epoch budget chosen by the sweep, tiny
            # val split only for logging — no selection happens on it
            val_fraction=0.05, keep_best=False,
        )
        from neural_speech_decoding_tpu.config import FilterConfig

        # same filter rendering the CV scored with (and that inference
        # serves) — not the f64 fidelity path
        params, history = train(
            ds, train_cfg=train_cfg, model=best["model"], model_kw=model_kw,
            filter_cfg=FilterConfig(precision="fast"),
        )
        save_params_npz(args.train_winner, params)
        print(f"saved {args.train_winner} ({len(history)} epochs)")


if __name__ == "__main__":
    main()
