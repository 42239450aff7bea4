"""Ensemble SIZE curve: accuracy vs member count, replayed post-hoc.

The deployed recipes ship K=5 seed ensembles (docs/BENCHMARKS.md). This
tool asks how accuracy actually scales with K — is 5 past the knee, and
what does the 9-seed evidence say about diminishing returns? — without
retraining anything: for each k = 1..K it averages the mean-softmax
accuracy over member SUBSETS of size k, drawn from the per-member
nested-CV probabilities stored in a tools/crossval.py JSON
(`fold_detail`). Per-window and session-level (10-window product
protocol, identical draws for every k so the curve is resampling-noise
free) are both reported.

Subsets are enumerated exactly when C(K, k) <= --max-subsets, else that
many distinct subsets are sampled uniformly; the subset spread (std over
subsets) is reported alongside, since at small k it IS the seed-choice
risk a deployer takes.

  python tools/ensemble_size_study.py checkpoints/crossval_logcov8_drop0_seeds9.json
"""

from __future__ import annotations

import argparse
import glob as globmod
import json
import sys
from itertools import combinations
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from tools.session_eval import session_accuracy_from_probs  # noqa: E402


def _subsets(k_total: int, k: int, max_subsets: int, rng) -> list:
    from math import comb

    if comb(k_total, k) <= max_subsets:
        return list(combinations(range(k_total), k))
    seen = set()
    while len(seen) < max_subsets:
        seen.add(tuple(sorted(rng.choice(k_total, size=k, replace=False))))
    return sorted(seen)


def size_curve(
    path: str,
    *,
    n_windows: int = 10,
    draws: int = 2000,
    sample_seed: int = 123,
    max_subsets: int = 30,
) -> dict:
    """{k: {per_window, session, per_window_subset_std, session_subset_std}}
    — fold means; subset std is the mean over folds of the std across
    member subsets (the seed-lottery spread at that ensemble size)."""
    detail = json.loads(Path(path).read_text())
    fold_detail = detail.get("fold_detail")
    if not fold_detail:
        raise SystemExit(f"{path} has no fold_detail")
    k_total = len(fold_detail[0]["member_nested_probs"])
    rng_subsets = np.random.default_rng(sample_seed)
    out = {}
    for k in range(1, k_total + 1):
        subs = _subsets(k_total, k, max_subsets, rng_subsets)
        pw_folds, ss_folds, pw_spread, ss_spread = [], [], [], []
        for fi, fold in enumerate(fold_detail):
            member_probs = np.asarray(fold["member_nested_probs"])
            y = np.asarray(fold["y_val"])
            rng = np.random.default_rng(sample_seed + fi)
            draws_rng_state = rng.bit_generator.state
            pw_s, ss_s = [], []
            for sub in subs:
                probs = member_probs[list(sub)].mean(axis=0)
                pw_s.append(float((probs.argmax(1) == y).mean()))
                # identical session draws for every subset and every k
                rng.bit_generator.state = draws_rng_state
                ss_s.append(
                    session_accuracy_from_probs(
                        probs, y, n_windows=n_windows, draws=draws, rng=rng
                    )
                )
            pw_folds.append(float(np.mean(pw_s)))
            ss_folds.append(float(np.mean(ss_s)))
            pw_spread.append(float(np.std(pw_s)))
            ss_spread.append(float(np.std(ss_s)))
        out[k] = {
            "per_window": float(np.mean(pw_folds)),
            "session": float(np.mean(ss_folds)),
            "per_window_subset_std": float(np.mean(pw_spread)),
            "session_subset_std": float(np.mean(ss_spread)),
            "n_subsets": len(subs),
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="+", help="crossval JSONs; globs ok")
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--draws", type=int, default=2000)
    ap.add_argument("--sample-seed", type=int, default=123)
    ap.add_argument("--max-subsets", type=int, default=30)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    files = []
    for f in args.files:
        hits = sorted(globmod.glob(f))
        files.extend(hits or [f])

    results = {}
    for f in files:
        curve = size_curve(
            f, n_windows=args.windows, draws=args.draws,
            sample_seed=args.sample_seed, max_subsets=args.max_subsets,
        )
        results[f] = curve
        print(f"{Path(f).name}:")
        print(
            f"  {'k':>2} {'per-window':>10} {'±subset':>8} "
            f"{'session':>8} {'±subset':>8} {'subsets':>8}"
        )
        for k, r in curve.items():
            print(
                f"  {k:>2} {r['per_window']:>10.3f} "
                f"{r['per_window_subset_std']:>8.3f} {r['session']:>8.3f} "
                f"{r['session_subset_std']:>8.3f} {r['n_subsets']:>8}"
            )

    if args.json:
        Path(args.json).write_text(
            json.dumps(
                {"files": files, "curves": results, "windows": args.windows,
                 "draws": args.draws, "max_subsets": args.max_subsets},
                indent=1,
            )
        )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
