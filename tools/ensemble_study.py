"""Post-hoc ensemble-aggregator comparison on a crossval JSON.

Reads the `fold_detail` written by tools/crossval.py (per-member nested
probabilities on each outer fold) and scores aggregation rules without any
retraining: mean probability, median probability, majority vote, mean
log-probability (geometric), and the per-member mean for reference.

  python tools/ensemble_study.py checkpoints/crossval_logcov8_seeds5.json
"""

from __future__ import annotations

import json
import sys

import numpy as np


def score(agg_probs: np.ndarray, y: np.ndarray) -> float:
    return float((agg_probs.argmax(-1) == y).mean())


def main() -> None:
    path = sys.argv[1]
    d = json.loads(open(path).read())
    detail = d.get("fold_detail")
    if not detail:
        raise SystemExit(f"{path} has no fold_detail (re-run tools/crossval.py)")

    rules = {
        "mean prob": lambda p: p.mean(0),
        "median prob": lambda p: np.median(p, axis=0),
        "mean log-prob": lambda p: np.log(np.clip(p, 1e-9, None)).mean(0),
        "majority vote": lambda p: np.stack(
            [
                np.bincount(p[:, i].argmax(-1), minlength=p.shape[-1])
                for i in range(p.shape[1])
            ]
        ),
    }
    acc = {name: [] for name in rules}
    acc["per-member mean"] = []
    for fold in detail:
        y = np.asarray(fold["y_val"])
        probs = np.asarray(fold["member_nested_probs"])  # [M, N, K]
        for name, rule in rules.items():
            acc[name].append(score(rule(probs), y))
        acc["per-member mean"].append(
            float(np.mean([(p.argmax(-1) == y).mean() for p in probs]))
        )

    print(f"{d['model']} — {len(detail)} folds, "
          f"{len(detail[0]['members'])} members ({detail[0]['members']})")
    for name, vals in acc.items():
        print(f"  {name:16s} {np.mean(vals):.3f} ± {np.std(vals):.3f}")


if __name__ == "__main__":
    main()
