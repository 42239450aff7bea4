"""Session-level accuracy: the product metric of the reference app.

The reference's deliverable is NOT a per-window prediction: `run_trials`
collects 10 windows of one imagined word and averages the softmax
probabilities before the argmax (reference: Neuro-Alpha-App/Utilities/
tester.py:88-98). Its "~70%" readme claim implicitly lives on that
10-window averaged protocol; every CV number in docs/BENCHMARKS.md is
per-window. This tool computes the session-level figure — for our models
AND the reference checkpoint — from the nested-CV probabilities already
stored in a tools/crossval.py JSON (`fold_detail`), with no retraining:

  for each outer fold and each class, draw N-window subsets of that
  class's HELD-OUT windows, mean the (ensemble) per-window probabilities,
  argmax; accuracy over draws = P(the averaged session prediction is
  right). Selection honesty is inherited from crossval: every per-window
  probability came from an epoch chosen on the inner split only.

  python tools/session_eval.py checkpoints/crossval_logcov8_whiten_cleanfit.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def session_accuracy_from_probs(
    probs: np.ndarray,
    labels: np.ndarray,
    *,
    n_windows: int = 10,
    draws: int = 2000,
    rng: np.random.Generator,
) -> float:
    """P(argmax of the mean over an n-window same-class draw is correct).

    Draws sample without replacement when the class has >= n_windows
    held-out windows, with replacement otherwise (mirroring that the
    reference's 10 trials are 10 real windows of one session, possibly
    repeating under drop-oldest backpressure)."""
    correct = total = 0
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        replace = len(idx) < n_windows
        for _ in range(draws):
            pick = rng.choice(idx, size=n_windows, replace=replace)
            pred = probs[pick].mean(axis=0).argmax()
            correct += int(pred == c)
            total += 1
    return correct / total


def evaluate(
    cv_json: str,
    n_windows: int = 10,
    draws: int = 2000,
    sample_seed: int = 123,
    with_reference: bool = True,
) -> dict:
    detail = json.loads(Path(cv_json).read_text())
    fold_detail = detail.get("fold_detail")
    if not fold_detail:
        raise SystemExit(
            f"{cv_json} has no fold_detail — re-run tools/crossval.py "
            "(fold_detail ships in every current run)"
        )
    cfg = detail["config"]

    import jax

    from neural_speech_decoding_tpu.config import FilterConfig
    from neural_speech_decoding_tpu.io.dataset import load_trials
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
    from tools.crossval import REFERENCE_CKPT, stratified_folds

    n_classes = len(fold_detail[0]["member_nested_probs"][0][0])
    if n_classes == 5:
        from neural_speech_decoding_tpu.config import FIVE_CLASS_PREFIXES

        ds = load_trials(class_prefixes=FIVE_CLASS_PREFIXES)
        with_reference = False  # the reference has no 5-class decoder
    else:
        ds = load_trials()
    folds = stratified_folds(ds.labels, detail["folds"], cfg["seed"])

    ref_probs_fn = None
    filtered = None
    if with_reference:
        from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params

        filtered = np.asarray(
            mai_filter_batch(ds.windows, FilterConfig(precision="fast"))
        )
        lstm_spec = get_model("lstm")
        ref = load_decoder_params(REFERENCE_CKPT)
        fn = jax.jit(
            lambda p, w: jax.nn.softmax(lstm_spec.apply(p, w, train=False), -1)
        )
        ref_probs_fn = lambda w: np.asarray(fn(ref, w))  # noqa: E731

    rng = np.random.default_rng(sample_seed)
    rows = {"ours": [], "ours_window": [], "ref": [], "ref_window": []}
    for fold_i, (val_idx, fd) in enumerate(zip(folds, fold_detail)):
        y_val = np.asarray(fd["y_val"])
        if not np.array_equal(ds.labels[val_idx], y_val):
            raise SystemExit(
                f"fold {fold_i}: reconstructed fold labels disagree with "
                f"{cv_json} — dataset or fold seed drifted since the CV run"
            )
        ours = np.mean(np.asarray(fd["member_nested_probs"]), axis=0)
        rows["ours"].append(
            session_accuracy_from_probs(
                ours, y_val, n_windows=n_windows, draws=draws, rng=rng
            )
        )
        rows["ours_window"].append(float((ours.argmax(1) == y_val).mean()))
        if ref_probs_fn is not None:
            rp = ref_probs_fn(filtered[val_idx])
            rows["ref"].append(
                session_accuracy_from_probs(
                    rp, y_val, n_windows=n_windows, draws=draws, rng=rng
                )
            )
            rows["ref_window"].append(float((rp.argmax(1) == y_val).mean()))

    def agg(v):
        return {
            "mean": float(np.mean(v)),
            "std": float(np.std(v)),
            "folds": [float(x) for x in v],
        } if v else None

    return {
        "cv_json": str(cv_json),
        "model": detail["model"],
        "n_windows": n_windows,
        "draws_per_class_per_fold": draws,
        "session": agg(rows["ours"]),
        "per_window": agg(rows["ours_window"]),
        "reference_session": agg(rows["ref"]),
        "reference_per_window": agg(rows["ref_window"]),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cv_jsons", nargs="+", help="tools/crossval.py output JSONs")
    ap.add_argument("--windows", type=int, default=10,
                    help="windows per session draw (reference: 10 trials)")
    ap.add_argument("--draws", type=int, default=2000)
    ap.add_argument("--sample-seed", type=int, default=123)
    ap.add_argument("--json", default=None)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    out = []
    for cv in args.cv_jsons:
        r = evaluate(cv, n_windows=args.windows, draws=args.draws,
                     sample_seed=args.sample_seed)
        out.append(r)
        s, w = r["session"], r["per_window"]
        print(f"{r['model']} ({Path(cv).name}):")
        print(f"  session ({args.windows}-window avg): "
              f"{s['mean']:.3f} ± {s['std']:.3f}   "
              f"(per-window {w['mean']:.3f})")
        if r["reference_session"]:
            rs, rw = r["reference_session"], r["reference_per_window"]
            print(f"  reference checkpoint:              "
                  f"{rs['mean']:.3f} ± {rs['std']:.3f}   "
                  f"(per-window {rw['mean']:.3f})")
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
