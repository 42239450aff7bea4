"""Post-hoc ensemble AGGREGATOR study: is mean-softmax the right combiner?

Every ensemble number in docs/BENCHMARKS.md combines the K members'
per-window probabilities by MEAN softmax — the same combiner the serving
engine uses (runtime/ensemble.py) and the natural generalization of the
reference's single-model session average (Neuro-Alpha-App/Utilities/
tester.py:88-98). This tool asks, at zero retraining cost, whether a more
robust combiner buys accuracy: it replays alternative aggregators over the
per-member nested-CV probabilities that tools/crossval.py already stores
in `fold_detail` (per fold: member_nested_probs [K, N, C] + y_val), so a
six-fold-seed repetition screen costs seconds, not six hours of CPU.

Aggregators (all selection-free — no held-out information is used to tune
them, so the nested-CV honesty of the inputs is preserved):

  mean     baseline: mean of member softmaxes (the deployed combiner)
  median   per-class median over members — robust to one confidently-wrong
           member (does not sum to 1; argmax and session averaging are
           scale-free over a fixed renormalization, which we apply anyway)
  geomean  exp(mean(log p)) — the product-of-experts combiner; punishes
           members that assign near-zero to the true class
  trim1    mean with the per-class min and max member dropped (K >= 3)
  vote     majority vote over member argmaxes, as vote-fraction "probs"
           (ties resolve by mean softmax via an epsilon tiebreak)

Per file it reports per-window accuracy (fold mean, crossval's
convention) and session-level accuracy (10-window averaged product
protocol, via tools/session_eval.py's draw machinery) per aggregator;
across files (a fold-seed repetition set) it reports mean ± std.

  python tools/aggregator_study.py checkpoints/crossval_wd_feats_foldseed*.json
"""

from __future__ import annotations

import argparse
import glob as globmod
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

from tools.session_eval import session_accuracy_from_probs  # noqa: E402

AGGREGATORS = ("mean", "median", "geomean", "trim1", "vote")


def aggregate(member_probs: np.ndarray, how: str) -> np.ndarray:
    """[K, N, C] member probabilities -> [N, C] combined (renormalized so
    session averaging weights every window equally across aggregators)."""
    p = np.asarray(member_probs, dtype=np.float64)
    k = p.shape[0]
    if how == "mean":
        out = p.mean(axis=0)
    elif how == "median":
        out = np.median(p, axis=0)
    elif how == "geomean":
        out = np.exp(np.log(np.clip(p, 1e-12, None)).mean(axis=0))
    elif how == "trim1":
        if k < 3:
            out = p.mean(axis=0)
        else:
            out = (p.sum(axis=0) - p.max(axis=0) - p.min(axis=0)) / (k - 2)
    elif how == "vote":
        onehot = np.zeros_like(p)
        np.put_along_axis(
            onehot, p.argmax(axis=2, keepdims=True), 1.0, axis=2
        )
        # epsilon mean-softmax tiebreak: strict enough to never overturn a
        # vote margin (vote fractions are multiples of 1/K)
        out = onehot.mean(axis=0) + (1.0 / (4 * k)) * p.mean(axis=0)
    else:
        raise ValueError(f"unknown aggregator {how!r}")
    s = out.sum(axis=1, keepdims=True)
    return out / np.where(s > 0, s, 1.0)


def study_file(
    path: str,
    *,
    n_windows: int = 10,
    draws: int = 2000,
    sample_seed: int = 123,
    aggregators=AGGREGATORS,
) -> dict:
    """Per-aggregator {per_window, session} (fold means) for one crossval
    JSON; per-fold accuracies included for inspection."""
    detail = json.loads(Path(path).read_text())
    fold_detail = detail.get("fold_detail")
    if not fold_detail:
        raise SystemExit(f"{path} has no fold_detail")
    out = {}
    for how in aggregators:
        pw_folds, sess_folds = [], []
        for fold in fold_detail:
            member_probs = np.asarray(fold["member_nested_probs"])
            y = np.asarray(fold["y_val"])
            probs = aggregate(member_probs, how)
            pw_folds.append(float((probs.argmax(1) == y).mean()))
            # fresh per-fold rng with a fold-independent seed: every
            # aggregator scores the SAME session draws, so differences
            # are combiner effects, not resampling noise
            rng = np.random.default_rng(sample_seed + len(sess_folds))
            sess_folds.append(
                session_accuracy_from_probs(
                    probs, y, n_windows=n_windows, draws=draws, rng=rng
                )
            )
        out[how] = {
            "per_window": float(np.mean(pw_folds)),
            "session": float(np.mean(sess_folds)),
            "per_window_folds": pw_folds,
            "session_folds": sess_folds,
        }
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "files", nargs="+",
        help="crossval JSONs of ONE config (e.g. a fold-seed repetition "
             "set); globs ok",
    )
    ap.add_argument("--windows", type=int, default=10)
    ap.add_argument("--draws", type=int, default=2000)
    ap.add_argument("--sample-seed", type=int, default=123)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    files = []
    for f in args.files:
        hits = sorted(globmod.glob(f))
        files.extend(hits or [f])

    per_file = {}
    for f in files:
        per_file[f] = study_file(
            f, n_windows=args.windows, draws=args.draws,
            sample_seed=args.sample_seed,
        )
        row = "  ".join(
            f"{how}={r['per_window']:.3f}/{r['session']:.3f}"
            for how, r in per_file[f].items()
        )
        print(f"{Path(f).name}: {row}")

    summary = {}
    print(f"\nacross {len(files)} runs (per-window / session, mean ± std):")
    for how in AGGREGATORS:
        pw = np.array([per_file[f][how]["per_window"] for f in files])
        ss = np.array([per_file[f][how]["session"] for f in files])
        summary[how] = {
            "per_window_mean": float(pw.mean()),
            "per_window_std": float(pw.std()),
            "session_mean": float(ss.mean()),
            "session_std": float(ss.std()),
        }
        print(
            f"  {how:8s} {pw.mean():.3f} ± {pw.std():.3f}  /  "
            f"{ss.mean():.3f} ± {ss.std():.3f}"
        )

    if args.json:
        Path(args.json).write_text(
            json.dumps(
                {"files": files, "per_file": per_file, "summary": summary,
                 "windows": args.windows, "draws": args.draws},
                indent=1,
            )
        )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
