"""Training CLI.

  python -m neural_speech_decoding_tpu.train --model lstm --epochs 80 \
      --out checkpoints/lstm3.npz

Model families come from the registry (lstm, lstm5, eegnet, transformer,
...); "5" variants train on the full 5-class dataset (re-adding yes/no,
BASELINE.json config 2). Output checkpoints are native .npz pytrees usable
by run_trials via --model path --family name.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from neural_speech_decoding_tpu.config import (
    FIVE_CLASS_PREFIXES,
    THREE_CLASS_PREFIXES,
    FilterConfig,
)
from neural_speech_decoding_tpu.io.dataset import load_trials
from neural_speech_decoding_tpu.io.params_io import save_params_npz
from neural_speech_decoding_tpu.models.registry import available_models, get_model
from neural_speech_decoding_tpu.train.loop import TrainConfig, train


def main() -> None:
    ap = argparse.ArgumentParser(description="Train an EEG decoder")
    ap.add_argument("--model", default="lstm", choices=available_models())
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--weight-decay", type=float, default=0.0)
    ap.add_argument("--label-smoothing", type=float, default=0.0)
    ap.add_argument("--augment", type=float, default=0.0,
                    help="noise-injection augmentation probability")
    ap.add_argument("--aug-kinds", default="noise", choices=("noise", "all"),
                    help="'all' adds time_shift/scale/channel_drop")
    ap.add_argument("--schedule", default="constant", choices=("constant", "cosine"))
    ap.add_argument("--patience", type=int, default=0,
                    help="early-stop patience in epochs (0 = off)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-fraction", type=float, default=0.2)
    ap.add_argument("--lambda", dest="lambd", type=float, default=1.25e-29,
                    help="tailoring lambda for the spatial filter")
    ap.add_argument("--out", default=None, help="output .npz checkpoint path")
    ap.add_argument("--history-out", default=None)
    ap.add_argument("--mesh", action="store_true",
                    help="data-parallel training over all visible devices")
    ap.add_argument(
        "--model-kw", action="append", default=[], metavar="KEY=VALUE",
        help="model-config override forwarded to the registry (repeatable), "
             "e.g. --model-kw whiten=true; values parse as JSON",
    )
    ap.add_argument(
        "--platform", default=None,
        help="jax platform override (e.g. cpu for cheap families)",
    )
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from neural_speech_decoding_tpu.models.registry import parse_model_kw

    model_kw = parse_model_kw(args.model_kw)
    spec = get_model(args.model, **model_kw)
    prefixes = (
        FIVE_CLASS_PREFIXES if len(spec.class_names) == 5 else THREE_CLASS_PREFIXES
    )
    ds = load_trials(args.data_dir, class_prefixes=prefixes)
    print(f"dataset: {len(ds)} trials, classes {dict(zip(ds.class_prefixes, ds.class_counts()))}")

    mesh = None
    if args.mesh:
        from neural_speech_decoding_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(tp=1)
        print(f"mesh: {dict(mesh.shape)}")

    params, history = train(
        ds,
        model=args.model,
        model_kw=model_kw,
        train_cfg=TrainConfig(
            learning_rate=args.lr,
            weight_decay=args.weight_decay,
            epochs=args.epochs,
            batch_size=args.batch_size,
            label_smoothing=args.label_smoothing,
            seed=args.seed,
            val_fraction=args.val_fraction,
            augment_prob=args.augment,
            augment_kinds=args.aug_kinds,
            schedule=args.schedule,
            early_stop_patience=args.patience,
        ),
        filter_cfg=FilterConfig(lambd=args.lambd, precision="fast"),
        mesh=mesh,
    )

    best = max(history, key=lambda h: h["val_accuracy"])
    print(
        f"final val_acc {history[-1]['val_accuracy']:.3f} "
        f"(best {best['val_accuracy']:.3f} @ epoch {best['epoch']})"
    )
    if args.out:
        save_params_npz(args.out, params)
        print(f"saved checkpoint -> {args.out}")
    if args.history_out:
        Path(args.history_out).write_text(json.dumps(history, indent=1))
        print(f"saved history -> {args.history_out}")


if __name__ == "__main__":
    main()
