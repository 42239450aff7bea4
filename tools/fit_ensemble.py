"""Fit a deployment seed ensemble: K full-dataset training runs -> K .npz.

The claim-grade accuracy number for an ensemble is its nested-CV estimate
(tools/crossval.py --seeds K); this tool produces the matching deployment
artifact — the SAME configuration refit K times on ALL trials with the
fixed epoch budget and no checkpoint selection (the protocol the CV
estimate assumes), one member per seed. Serve the members with
runtime.ensemble.EnsembleEngine, which decodes all K in one vmapped pass.

  python tools/fit_ensemble.py --model tcn --seeds 5 --epochs 120 \
      --augment 0.5 --out-prefix checkpoints/tcn3_ens

  ->  checkpoints/tcn3_ens_s0.npz ... _s4.npz  +  _manifest.json
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO_ROOT))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tcn")
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--augment", type=float, default=0.5)
    ap.add_argument("--aug-kinds", default="noise", choices=("noise", "all"))
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--schedule", default="constant", choices=("constant", "cosine"))
    ap.add_argument("--base-seed", type=int, default=0)
    ap.add_argument("--out-prefix", required=True)
    ap.add_argument(
        "--model-kw", action="append", default=[], metavar="KEY=VALUE",
        help="model-config override forwarded to the registry (repeatable); "
             "recorded in the manifest so EnsembleEngine.from_manifest "
             "rebuilds the same config",
    )
    ap.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. cpu for cheap families)",
    )
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from neural_speech_decoding_tpu.config import (
        FIVE_CLASS_PREFIXES,
        FilterConfig,
    )
    from neural_speech_decoding_tpu.io.dataset import load_trials
    from neural_speech_decoding_tpu.io.params_io import save_params_npz
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
    from neural_speech_decoding_tpu.train.loop import TrainConfig, train

    import numpy as np

    from neural_speech_decoding_tpu.models.registry import (
        family_model_kw,
        parse_model_kw,
    )

    model_kw = parse_model_kw(args.model_kw)
    # "logcov8+logcov12" fits a cross-family mix: `seeds` members per
    # family (the crossval ensemble convention), per-family overrides via
    # the same "fam:key=value" model_kw routing
    families = [f.strip() for f in args.model.split("+") if f.strip()]
    specs = {
        fam: get_model(fam, **family_model_kw(model_kw, fam))
        for fam in families
    }
    n_classes = {len(s.class_names) for s in specs.values()}
    if len(n_classes) != 1:
        raise SystemExit(
            f"mixed families disagree on class count: {args.model}"
        )
    spec = specs[families[0]]
    if len(spec.class_names) == 5:
        ds = load_trials(class_prefixes=FIVE_CLASS_PREFIXES)
    else:
        ds = load_trials()
    # render the filter once; every member trains on the same (serving)
    # precision path
    fcfg = FilterConfig(precision="fast")
    preprocessed = np.asarray(mai_filter_batch(ds.windows, fcfg))

    # data-dependent init (logcov tangent-point whitener): fit ONCE on the
    # full clean filtered dataset and share it across members — crossval's
    # ensemble members share the fold's whitener the same way
    # (tools/crossval.py:229-231, "the whitener is a fold property"), so
    # the shared buffer is what the CV estimate describes; it also lets
    # EnsembleEngine extract features once and vmap only the heads
    # (share_features="auto"). Per-member init otherwise differs normally.
    import jax

    members = []
    member_families = []
    total = args.seeds * len(families)
    for fam in families:
        fam_spec = specs[fam]
        fam_kw = family_model_kw(model_kw, fam)
        shared_fit = None
        if fam_spec.fit is not None:
            shared_fit = lambda p: fam_spec.fit(  # noqa: E731
                p, preprocessed, ds.labels.astype(np.int32)
            )
        for s in range(args.seeds):
            # same member-seed derivation as crossval's ensemble (fold 0
            # slot); families share the seed set, as in crossval mixes
            member_seed = args.base_seed + 9973 * s
            train_cfg = TrainConfig(
                learning_rate=args.lr, epochs=args.epochs, batch_size=32,
                label_smoothing=args.label_smoothing, seed=member_seed,
                schedule=args.schedule, augment_prob=args.augment,
                augment_kinds=args.aug_kinds,
                # deployment fit: fixed budget, tiny val split for logging
                val_fraction=0.05, keep_best=False,
            )
            print(
                f"[member {len(members) + 1}/{total}] {fam} "
                f"seed={member_seed}",
                flush=True,
            )
            init_params = None
            if shared_fit is not None:
                rng = jax.random.PRNGKey(member_seed)
                _, k = jax.random.split(rng)  # train()'s init-key derivation
                init_params = shared_fit(fam_spec.init(k))
            params, history = train(
                ds, train_cfg=train_cfg, model=fam, model_kw=fam_kw,
                preprocessed=preprocessed, verbose=False,
                init_params=init_params,
            )
            suffix = f"_{fam}_s{s}" if len(families) > 1 else f"_s{s}"
            out = f"{args.out_prefix}{suffix}.npz"
            save_params_npz(out, params)
            print(f"  saved {out} ({len(history)} epochs, "
                  f"final train acc {history[-1].get('train_accuracy', float('nan')):.3f})",
                  flush=True)
            members.append(out)
            member_families.append(fam)

    manifest = {
        "model": args.model,
        "members": members,
        "families": member_families,
        "config": {
            "epochs": args.epochs, "augment": args.augment,
            "aug_kinds": args.aug_kinds,
            "label_smoothing": args.label_smoothing, "lr": args.lr,
            "schedule": args.schedule, "base_seed": args.base_seed,
            "model_kw": model_kw,
        },
        "serve_with": "neural_speech_decoding_tpu.runtime.EnsembleEngine",
    }
    manifest_path = f"{args.out_prefix}_manifest.json"
    Path(manifest_path).write_text(json.dumps(manifest, indent=2))
    print(f"wrote {manifest_path}")


if __name__ == "__main__":
    main()
