"""K-fold cross-validated accuracy — the rigorous form of the accuracy claim.

Single 20%-split numbers on 179 trials have ±8% noise; this trains one
model per fold and reports mean ± std held-out accuracy, plus the reference
checkpoint evaluated on the same folds (remember: it trained on all of
them, so its number is an upper bound of its true held-out accuracy).

Protocols (--protocol, default "nested"):
  nested  epoch selection on an inner split carved out of the fold's
          TRAINING set (keep-best on inner val, report that epoch's params
          on the untouched outer fold) — unbiased, the headline number.
  last    fixed-budget protocol: the final epoch's params on the outer
          fold — unbiased, no selection at all.
  biased  round-1's protocol: max over epochs of the outer-fold accuracy
          itself. Epoch selection on the eval fold inflates the mean by
          several points on ~36-trial folds; kept only for comparison.
All three are computed in one run (training is the expensive part); the
--protocol flag picks which one is the headline "ours" column.

--seeds K (default 1) trains K models per fold (different init /
augmentation / batch-order seeds) and ensembles them by averaging softmax
probabilities on the outer fold. Selection stays honest: each member's
epoch is chosen on the inner split only, so the ensemble never sees the
eval fold. The per-seed mean is reported alongside so the ensemble lift is
visible.

  python tools/crossval.py --model tcn --folds 5 --epochs 120 --seeds 5
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Optional

import numpy as np

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))

import jax

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params
from neural_speech_decoding_tpu.io.dataset import load_trials
from neural_speech_decoding_tpu.models.registry import get_model
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
from neural_speech_decoding_tpu.train.loop import TrainConfig

REFERENCE_CKPT = (
    "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
    "lstm_classifier_Water_Food_Bg_Noise.pth"
)


from neural_speech_decoding_tpu.models.registry import (  # noqa: E402
    family_model_kw,  # re-exported: tests and older callers import from here
    parse_model_kw,  # re-exported: fit_ensemble imports it from here
)


def stratified_folds(labels: np.ndarray, k: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    folds = [[] for _ in range(k)]
    for c in np.unique(labels):
        idx = rng.permutation(np.flatnonzero(labels == c))
        for i, j in enumerate(idx):
            folds[i % k].append(j)
    return [np.sort(np.asarray(f)) for f in folds]


def run_crossval(
    model: str = "lstm",
    folds: int = 5,
    epochs: int = 120,
    augment: float = 0.5,
    aug_kinds: str = "noise",
    label_smoothing: float = 0.1,
    lr: float = 1e-3,
    schedule: str = "constant",
    seed: int = 0,
    protocol: str = "nested",
    seeds: int = 1,
    model_kw: Optional[dict] = None,
    class_weight: str = "none",
    verbose: bool = True,
) -> dict:
    """K-fold CV of one configuration; returns the summary dict (the
    importable form — tools/sweep.py grids over this)."""

    def log(msg):
        if verbose:
            print(msg, flush=True)

    # "tcn+logcov" cross-validates a cross-family ensemble: `seeds` members
    # per family, all probabilities averaged (families with different
    # inductive biases give the diversity seed ensembles of one family lack)
    families = [f.strip() for f in model.split("+") if f.strip()]

    specs = {
        name: get_model(name, **family_model_kw(model_kw, name))
        for name in families
    }
    if len({len(s.class_names) for s in specs.values()}) != 1:
        raise ValueError(f"ensemble families disagree on classes: {families}")
    spec_probe = specs[families[0]]
    if len(spec_probe.class_names) == 5:
        from neural_speech_decoding_tpu.config import FIVE_CLASS_PREFIXES

        ds = load_trials(class_prefixes=FIVE_CLASS_PREFIXES)
    else:
        ds = load_trials()
    fcfg = FilterConfig(precision="fast")
    filtered = np.asarray(mai_filter_batch(ds.windows, fcfg))
    ref = load_decoder_params(REFERENCE_CKPT)
    lstm_spec = get_model("lstm")

    # class-balanced CE (--class-weight balanced): inverse-frequency
    # weights from the GLOBAL class counts (a dataset property — the
    # 40-trial background class vs ~70 for the others — and constant
    # across folds, so every fold shares one compiled step)
    class_weights = None
    if class_weight == "balanced":
        counts = ds.class_counts().astype(np.float64)
        w = counts.sum() / (len(counts) * np.maximum(counts, 1))
        class_weights = tuple(float(v) for v in w)

    from neural_speech_decoding_tpu.train.augment import (
        ALL_KINDS,
        KINDS,
        augment_batch_np,
    )
    from neural_speech_decoding_tpu.train.loop import (
        _optimizer,
        make_eval_fn,
        make_train_step,
    )

    # Feature-space fast path: families with a parameter-free feature
    # extractor (logcov — ModelSpec.featurize/head_apply) featurize each
    # window ONCE per fold/member and train every epoch in the tiny head
    # space, instead of re-running band covariances + the 320-step
    # Clenshaw per step. Identical math (apply == head_apply(featurize)),
    # ~10x faster logcov sweeps.
    feat_fns = {
        n: jax.jit(s.featurize)
        for n, s in specs.items()
        if s.featurize is not None
    }

    def _model_for(n):
        s = specs[n]
        if s.featurize is not None:
            return lambda p, f, *, train=False, rng=None, s=s: s.head_apply(
                p, f, train=train, rng=rng
            )
        return s

    def _featurize_np(family, params, arr: np.ndarray) -> np.ndarray:
        """Featurize with zero-padding to a multiple of 32 so augmented
        batches (variable size per seed) hit few compiled shapes."""
        n = arr.shape[0]
        if n == 0:
            probe = np.asarray(
                feat_fns[family](params, jnp.zeros((1,) + arr.shape[1:], np.float32))
            )
            return np.zeros((0, probe.shape[1]), np.float32)
        pad = (-n) % 32
        if pad:
            arr = np.concatenate(
                [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)]
            )
        return np.asarray(feat_fns[family](params, jnp.asarray(arr)))[:n]

    import jax.numpy as jnp

    # Jitted callables hoisted out of the fold loop: rebuilding them per
    # fold/member would bust jax's jit cache (new function objects) and pay
    # the ~30 s remote-compile cost dozens of times instead of once per
    # distinct (family, shape).
    eval_fns = {n: jax.jit(make_eval_fn(_model_for(n))) for n in specs}
    probs_fns = {}
    for n, s in specs.items():
        if s.featurize is not None:
            probs_fns[n] = jax.jit(
                lambda p, f, s=s: jax.nn.softmax(
                    s.head_apply(p, f, train=False), axis=-1
                )
            )
        else:
            probs_fns[n] = jax.jit(
                lambda p, x, s=s: jax.nn.softmax(
                    s.apply(p, x, train=False), axis=-1
                )
            )
    ref_logits_fn = jax.jit(lambda p, w: lstm_spec.apply(p, w, train=False))
    # optimizer + train step reused across members/folds; keyed by
    # steps_per_epoch because the cosine schedule depends on it (the
    # optimizer is seed-independent)
    _step_cache: dict = {}

    def step_and_opt(family: str, steps_per_epoch: int):
        key = (family, steps_per_epoch)
        if key not in _step_cache:
            opt_cfg = TrainConfig(
                learning_rate=lr, epochs=epochs, batch_size=32,
                label_smoothing=label_smoothing, schedule=schedule,
            )
            optimizer = _optimizer(opt_cfg, steps_per_epoch)
            step_fn = jax.jit(
                make_train_step(
                    _model_for(family), optimizer, label_smoothing,
                    class_weights=class_weights,
                ),
                donate_argnums=(0, 1),
            )
            _step_cache[key] = (step_fn, optimizer)
        return _step_cache[key]

    def acc_on(family, p, x, y):
        w = np.ones(len(x), np.float32)
        return float(eval_fns[family](p, x, y.astype(np.int32), w)["accuracy"])

    def probs_on(family, p, x):
        return np.asarray(probs_fns[family](p, x))

    fold_indices = stratified_folds(ds.labels, folds, seed)
    ours = {"nested": [], "last": [], "swa": [], "biased": []}
    seed_means = {"nested": []}  # per-seed mean (no ensembling), for the lift
    theirs = []
    fold_detail = []  # per-member nested probs, for post-hoc aggregator study
    for fold_i, val_idx in enumerate(fold_indices):
        train_idx = np.setdiff1d(np.arange(len(ds)), val_idx)
        x_val, y_val = filtered[val_idx], ds.labels[val_idx]

        # Inner split (for nested epoch selection) comes out of the fold's
        # TRAINING set only — ~1/6 of it — before augmentation, so neither
        # the outer fold nor augmented copies of inner-val trials ever
        # influence which epoch is kept.
        inner_val_rel = stratified_folds(ds.labels[train_idx], 6, seed + 100 + fold_i)[0]
        inner_val_idx = train_idx[inner_val_rel]
        inner_train_idx = np.setdiff1d(train_idx, inner_val_idx)
        x_base, y_base = filtered[inner_train_idx], ds.labels[inner_train_idx]
        x_ival, y_ival = filtered[inner_val_idx], ds.labels[inner_val_idx]

        # per-fold feature cache (featurizing families): the whitener is a
        # deterministic function of the fold's clean training windows, so
        # base/inner-val/val features are identical across member seeds
        fold_feats: dict = {}

        def train_member(family: str, member_seed: int):
            """One training run; epoch selection on the inner split only.
            Returns (nested_params, last_params, biased_outer_acc)."""
            spec = specs[family]
            rng = jax.random.PRNGKey(member_seed)
            rng, k = jax.random.split(rng)
            params = spec.init(k)
            if spec.fit is not None:
                # data-dependent init (e.g. logcov whitener) — the fold's
                # CLEAN training windows only: never the eval fold, and not
                # the augmented copies (injected noise distorts the fitted
                # mean covariance)
                params = spec.fit(params, x_base, y_base)

            x_train, y_train = x_base, y_base
            xa = ya = None
            if augment > 0:
                xa, ya = augment_batch_np(
                    x_train, y_train, prob=augment, seed=member_seed,
                    kinds=ALL_KINDS if aug_kinds == "all" else KINDS,
                )
            if spec.featurize is not None:
                if family not in fold_feats:
                    fold_feats[family] = tuple(
                        _featurize_np(family, params, arr)
                        for arr in (x_base, x_ival, x_val)
                    )
                f_base, f_ival, f_val = fold_feats[family]
                x_train = f_base
                if xa is not None and len(xa):
                    x_train = np.concatenate(
                        [f_base, _featurize_np(family, params, xa)]
                    )
                    y_train = np.concatenate([y_base, ya])
                xt_ival, xt_val = f_ival, f_val
            else:
                if xa is not None and len(xa):
                    x_train = np.concatenate([x_base, xa])
                    y_train = np.concatenate([y_base, ya])
                xt_ival, xt_val = x_ival, x_val

            step_fn, optimizer = step_and_opt(family, max(1, len(x_train) // 32))
            opt_state = optimizer.init(params)
            np_rng = np.random.default_rng(member_seed)
            best_outer = -1.0  # the biased protocol, for comparison only
            best_inner = -1.0
            nested_params = None
            # SWA protocol: running mean of params over the LAST quarter
            # of the epoch budget — selection-free like "last" but
            # averaging out end-of-training oscillation (cheap: snapshots
            # are a ~30k-param head)
            swa_start = epochs - max(1, epochs // 4)
            swa_params, swa_n = None, 0
            for _epoch in range(epochs):
                perm = np_rng.permutation(len(x_train))
                for i in range(0, len(x_train) - 32 + 1, 32):
                    idx = perm[i : i + 32]
                    rng, k = jax.random.split(rng)
                    params, opt_state, _ = step_fn(
                        params, opt_state, x_train[idx],
                        y_train[idx].astype(np.int32), k,
                    )
                inner = acc_on(family, params, xt_ival, y_ival)
                if inner > best_inner:
                    best_inner = inner
                    # step_fn donates params; snapshot to host first
                    nested_params = jax.tree_util.tree_map(np.asarray, params)
                if _epoch >= swa_start:
                    snap = jax.tree_util.tree_map(np.asarray, params)
                    if swa_params is None:
                        swa_params = snap
                    else:
                        swa_params = jax.tree_util.tree_map(
                            lambda a, b: a + b, swa_params, snap
                        )
                    swa_n += 1
                best_outer = max(best_outer, acc_on(family, params, xt_val, y_val))
            last_params = jax.tree_util.tree_map(np.asarray, params)
            swa_params = jax.tree_util.tree_map(
                lambda a: (a / swa_n).astype(a.dtype), swa_params
            )
            return family, nested_params, last_params, best_outer, swa_params

        members = [
            train_member(fam, seed + fold_i + 9973 * s)
            for fam in families
            for s in range(seeds)
        ]

        def _xval_for(fam):
            return fold_feats[fam][2] if fam in fold_feats else x_val

        # Ensemble = mean softmax over members. Each member's epoch was
        # chosen on the inner split, so this never selects on the eval fold.
        # One forward pass per member per params-set; reused below for the
        # ensemble mean, the per-seed accuracies, and fold_detail.
        member_nested_probs = [
            probs_on(m[0], m[1], _xval_for(m[0])) for m in members
        ]
        nested_probs = np.mean(member_nested_probs, axis=0)
        last_probs = np.mean(
            [probs_on(m[0], m[2], _xval_for(m[0])) for m in members], axis=0
        )
        swa_probs = np.mean(
            [probs_on(m[0], m[4], _xval_for(m[0])) for m in members], axis=0
        )
        per_seed_nested = [
            float((p.argmax(1) == y_val).mean()) for p in member_nested_probs
        ]
        ours["nested"].append(float((nested_probs.argmax(1) == y_val).mean()))
        ours["last"].append(float((last_probs.argmax(1) == y_val).mean()))
        ours["swa"].append(float((swa_probs.argmax(1) == y_val).mean()))
        ours["biased"].append(float(np.mean([m[3] for m in members])))
        seed_means["nested"].append(float(np.mean(per_seed_nested)))
        detail = {
            "y_val": [int(v) for v in y_val],
            "members": [m[0] for m in members],
            "member_nested_probs": [
                p.round(5).tolist() for p in member_nested_probs
            ],
        }
        if len(families) == 1 and families[0] in fold_feats:
            # featurizing single-family runs also store the held-out
            # tangent features and each member's nested head params, so
            # tools/session_eval.py can study PRE-softmax aggregation
            # (averaging the 10 windows' tangent features per session draw
            # instead of their probabilities) without retraining
            detail["val_features"] = (
                np.asarray(fold_feats[families[0]][2]).round(5).tolist()
            )
            detail["member_nested_params"] = [
                jax.tree_util.tree_map(
                    lambda a: np.asarray(a).tolist(), m[1]
                )
                for m in members
            ]
        fold_detail.append(detail)

        if len(spec_probe.class_names) == 3:
            ref_logits = np.asarray(ref_logits_fn(ref, x_val))
            theirs.append(float((ref_logits.argmax(1) == y_val).mean()))
        else:
            # the reference has no 5-class decoder (it abandoned the task);
            # chance = 20%
            theirs.append(float("nan"))
        ens = (
            f" (per-seed {seed_means['nested'][-1]:.3f})"
            if len(members) > 1
            else ""
        )
        log(
            f"fold {fold_i}: nested {ours['nested'][-1]:.3f}{ens} | "
            f"last {ours['last'][-1]:.3f} | swa {ours['swa'][-1]:.3f} | "
            f"biased {ours['biased'][-1]:.3f} | "
            f"reference {theirs[-1]:.3f}"
        )

    summary = {
        "model": model,
        "folds": folds,
        "protocol": protocol,
        "seeds": seeds,
        "per_seed_nested": {
            "mean": float(np.mean(seed_means["nested"])),
            "std": float(np.std(seed_means["nested"])),
            "folds": seed_means["nested"],
        },
        "ours_mean": float(np.mean(ours[protocol])),
        "ours_std": float(np.std(ours[protocol])),
        "reference_mean": float(np.nanmean(theirs)),
        "reference_std": float(np.nanstd(theirs)),
        "by_protocol": {
            name: {"mean": float(np.mean(v)), "std": float(np.std(v)), "folds": v}
            for name, v in ours.items()
        },
        # nested/last score the K-member mean-softmax ensemble; "biased" has
        # no ensemble analogue (each member's max-over-epochs picks a
        # DIFFERENT epoch per member), so it averages per-member numbers —
        # don't read it as the same predictor as the other two rows.
        "biased_is_per_member": len(families) * seeds > 1,
        "reference": theirs,
        "fold_detail": fold_detail,
        "config": {
            "epochs": epochs, "augment": augment, "aug_kinds": aug_kinds,
            "label_smoothing": label_smoothing, "lr": lr,
            "schedule": schedule, "seed": seed, "seeds": seeds,
            "model_kw": model_kw or {},
            "class_weight": class_weight,
        },
    }
    n_members = len(families) * seeds
    log(
        f"\n{model} {folds}-fold"
        + (f", {n_members}-member ensemble" if n_members > 1 else "")
        + ":"
    )
    for name in ("nested", "last", "swa", "biased"):
        row = summary["by_protocol"][name]
        tag = " (headline)" if name == protocol else ""
        if name == "biased" and summary["biased_is_per_member"]:
            tag += " [per-member mean, not the ensemble]"
        log(f"  {name:7s} {row['mean']:.3f} ± {row['std']:.3f}{tag}")
    if n_members > 1:
        ps = summary["per_seed_nested"]
        log(f"  per-member nested (no ensemble) {ps['mean']:.3f} ± {ps['std']:.3f}")
    log(
        f"  reference checkpoint {summary['reference_mean']:.3f} "
        f"± {summary['reference_std']:.3f}"
    )
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="lstm")
    ap.add_argument("--folds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--augment", type=float, default=0.5)
    ap.add_argument("--aug-kinds", default="noise", choices=("noise", "all"))
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument(
        "--class-weight", default="none", choices=("none", "balanced"),
        help="'balanced' = inverse-frequency class-weighted CE (global "
             "dataset counts; targets the 40-trial background class)",
    )
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--schedule", default="constant", choices=("constant", "cosine"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--protocol", default="nested", choices=("nested", "last", "swa", "biased")
    )
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument(
        "--model-kw", action="append", default=[], metavar="KEY=VALUE",
        help="model-config field override forwarded to the registry, "
             "repeatable (e.g. --model-kw shrinkage=0.1 --model-kw "
             "dropout=0.0); values parse as JSON, falling back to string",
    )
    ap.add_argument("--json", default=None)
    ap.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. cpu — lets cheap-family CV run "
             "off-chip while the TPU is busy)",
    )
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    summary = run_crossval(
        model=args.model, folds=args.folds, epochs=args.epochs,
        augment=args.augment, aug_kinds=args.aug_kinds,
        label_smoothing=args.label_smoothing, lr=args.lr,
        schedule=args.schedule, seed=args.seed, protocol=args.protocol,
        seeds=args.seeds, model_kw=parse_model_kw(args.model_kw),
        class_weight=args.class_weight,
    )
    if args.json:
        Path(args.json).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
