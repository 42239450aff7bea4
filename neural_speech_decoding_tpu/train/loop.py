"""Training loop — reconstruction of the reference's missing trainer.

The reference's training notebook is absent from its snapshot
(`.MISSING_LARGE_BLOBS`, SURVEY.md intro); the hyperparameters that must
hold are the inference-side ones (hidden 48, 2 layers, dropout 0.60,
tailoring lambda — reference tester.py:73-86). This module rebuilds a
trainer around them: optax Adam(W), softmax cross-entropy with optional
label smoothing, train-mode dropout + RReLU sampling in the decoder, and
data-parallel execution over a `jax.sharding.Mesh` (batch over 'dp', grads
combined by GSPMD-inserted collectives).

Windows are MAI-filtered once up front (the filter has no trainable state),
so each epoch touches only the decoder compute.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
from neural_speech_decoding_tpu.models.lstm import decoder_apply, init_decoder_params
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-3
    weight_decay: float = 0.0
    epochs: int = 60
    batch_size: int = 32
    label_smoothing: float = 0.0
    grad_clip: float = 1.0
    seed: int = 0
    val_fraction: float = 0.2
    # lr schedule: "constant" | "cosine" (cosine decays to lr/100 over the
    # run with `warmup_epochs` of linear warmup)
    schedule: str = "constant"
    warmup_epochs: int = 5
    # stop after this many epochs without val-accuracy improvement; 0 = off
    early_stop_patience: int = 0
    # noise-injection augmentation (train/augment.py); 0 disables
    augment_prob: float = 0.0
    # "noise" = the reference's injectors; "all" adds the EEG-standard
    # time_shift / scale / channel_drop transforms
    augment_kinds: str = "noise"
    # orbax checkpoint/resume (train/checkpointing.py); None disables
    checkpoint_dir: Optional[str] = None
    checkpoint_every: int = 20
    resume: bool = True
    # return the params of the best-val-accuracy epoch instead of the last
    keep_best: bool = True


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0


def _as_apply_fn(model) -> Callable:
    """Normalize `model` to apply(params, x, *, train, rng) -> logits.
    Accepts a DecoderConfig (reference-parity LSTM), a registry ModelSpec,
    or a callable already in normalized form."""
    if isinstance(model, DecoderConfig):
        cfg = model
        return lambda p, x, *, train=False, rng=None: decoder_apply(
            p, x, cfg, train=train, rng=rng
        )
    if hasattr(model, "apply"):
        return model.apply
    if callable(model):
        return model
    raise TypeError(f"cannot build apply fn from {type(model)}")


def _loss_fn(
    params, batch_x, batch_y, rng, apply_fn, label_smoothing: float,
    class_weights=None,
):
    logits = apply_fn(params, batch_x, train=True, rng=rng)
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(batch_y, n_cls, dtype=logits.dtype)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / n_cls
    logp = jax.nn.log_softmax(logits, axis=-1)
    per_example = -jnp.sum(onehot * logp, axis=-1)
    if class_weights is not None:
        # class-balanced cross-entropy: weight each example by its class's
        # inverse frequency (normalized so a balanced batch keeps loss
        # scale). The dataset's background class has 40 trials vs ~70 for
        # the others (SURVEY.md §2.5) — unweighted CE under-trains it.
        w = jnp.asarray(class_weights, logp.dtype)[batch_y]
        loss = jnp.sum(w * per_example) / jnp.maximum(jnp.sum(w), 1e-9)
    else:
        loss = jnp.mean(per_example)
    acc = jnp.mean((jnp.argmax(logits, -1) == batch_y).astype(jnp.float32))
    return loss, acc


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    label_smoothing: float = 0.0,
    class_weights=None,
) -> Callable:
    """Build the jittable train step for any model family:
    (params, opt_state, x [B,T,C], y [B], rng) -> (params, opt_state, metrics)

    `model`: DecoderConfig | registry ModelSpec | normalized apply callable.
    `class_weights`: optional per-class loss weights (tuple, one per class)
    for class-balanced CE; None keeps the unweighted mean.
    """
    apply_fn = _as_apply_fn(model)
    class_weights = tuple(class_weights) if class_weights is not None else None

    def step(params, opt_state, x, y, rng):
        (loss, acc), grads = jax.value_and_grad(
            _loss_fn, has_aux=True
        )(params, x, y, rng, apply_fn, label_smoothing, class_weights)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    return step


def make_eval_fn(model) -> Callable:
    apply_fn = _as_apply_fn(model)
    def evaluate(params, x, y, w):
        """w: per-example weights (0 for padding rows added to make the
        batch divisible by the data-parallel axis)."""
        logits = apply_fn(params, x, train=False)
        per = -jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), y[:, None].astype(jnp.int32), axis=1
        )[:, 0]
        denom = jnp.maximum(jnp.sum(w), 1.0)
        loss = jnp.sum(per * w) / denom
        acc = jnp.sum((jnp.argmax(logits, -1) == y).astype(jnp.float32) * w) / denom
        return {"loss": loss, "accuracy": acc}

    return evaluate


def _pad_to_multiple(x: np.ndarray, m: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad axis 0 to a multiple of m (repeating row 0); returns (padded,
    weights) with weights 0 on padding."""
    n = x.shape[0]
    pad = (-n) % m
    w = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    if pad:
        x = np.concatenate([x, np.repeat(x[:1], pad, axis=0)], axis=0)
    return x, w


def _optimizer(
    cfg: TrainConfig, steps_per_epoch: int = 1
) -> optax.GradientTransformation:
    if cfg.schedule == "cosine":
        warmup = max(1, cfg.warmup_epochs * steps_per_epoch)
        total = max(warmup + 1, cfg.epochs * steps_per_epoch)
        lr = optax.warmup_cosine_decay_schedule(
            init_value=cfg.learning_rate / 100.0,
            peak_value=cfg.learning_rate,
            warmup_steps=warmup,
            decay_steps=total,
            end_value=cfg.learning_rate / 100.0,
        )
    elif cfg.schedule == "constant":
        lr = cfg.learning_rate
    else:
        raise ValueError(f"unknown schedule {cfg.schedule!r}")
    if cfg.weight_decay > 0:
        # decoupled decay must not touch non-trainable fitted buffers
        # (zero gradient does not protect against adamw's multiplicative
        # decay): mask out any "whitener" leaf (logcov tangent point)
        def _decay_mask(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not any(
                    getattr(k, "key", None) == "whitener" for k in path
                ),
                params,
            )

        tx = optax.adamw(lr, weight_decay=cfg.weight_decay, mask=_decay_mask)
    else:
        tx = optax.adam(lr)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def train(
    dataset,
    decoder_cfg: Optional[DecoderConfig] = None,
    train_cfg: TrainConfig = TrainConfig(),
    filter_cfg: Optional[FilterConfig] = None,
    mesh=None,
    init_params=None,
    verbose: bool = True,
    preprocessed: Optional[np.ndarray] = None,
    model: Optional[str] = None,
    model_kw: Optional[Dict[str, Any]] = None,
) -> Tuple[Any, List[Dict[str, float]]]:
    """Train a decoder on a TrialDataset. Returns (params, history).

    `model`: a registry name ("lstm", "eegnet", "transformer", ...); when
    given, its spec supplies apply/init. Otherwise the reference-parity
    LSTM with `decoder_cfg` is used. With `mesh`, batches are sharded over
    the 'dp' axis (params replicated; gradient reduction happens inside jit
    via GSPMD collectives).
    """
    if model is not None:
        from neural_speech_decoding_tpu.models.registry import get_model

        spec = get_model(model, **(model_kw or {}))
        model_for_step: Any = spec
    else:
        decoder_cfg = decoder_cfg or DecoderConfig(num_classes=dataset.num_classes)
        spec = None
        model_for_step = decoder_cfg
    filter_cfg = filter_cfg or FilterConfig()

    train_ds, val_ds = dataset.split(train_cfg.val_fraction, seed=train_cfg.seed)
    if preprocessed is not None:
        assert preprocessed.shape == dataset.windows.shape
        index = {f: i for i, f in enumerate(dataset.files)}
        x_train = np.stack([preprocessed[index[f]] for f in train_ds.files])
        x_val = np.stack([preprocessed[index[f]] for f in val_ds.files])
    else:
        x_train = np.asarray(mai_filter_batch(train_ds.windows, filter_cfg))
        x_val = np.asarray(mai_filter_batch(val_ds.windows, filter_cfg))
    y_train = train_ds.labels.astype(np.int32)
    y_val = val_ds.labels.astype(np.int32)

    x_clean, y_clean = x_train, y_train  # pre-augmentation training data
    if train_cfg.augment_prob > 0:
        from neural_speech_decoding_tpu.train.augment import (
            ALL_KINDS,
            KINDS,
            augment_batch_np,
        )

        x_aug, y_aug = augment_batch_np(
            x_train, y_train, prob=train_cfg.augment_prob, seed=train_cfg.seed,
            kinds=ALL_KINDS if train_cfg.augment_kinds == "all" else KINDS,
        )
        x_train = np.concatenate([x_train, x_aug])
        y_train = np.concatenate([y_train, y_aug])

    rng = jax.random.PRNGKey(train_cfg.seed)
    if init_params is None:
        rng, k = jax.random.split(rng)
        init_params = spec.init(k) if spec is not None else init_decoder_params(k, decoder_cfg)
        if spec is not None and spec.fit is not None:
            # data-dependent init (e.g. logcov tangent-point whitener) —
            # CLEAN training data only (never the eval split, and not the
            # augmented copies: injected bursts/flatlines would distort the
            # fitted mean covariance); a resumed init_params carries it
            init_params = spec.fit(init_params, x_clean, y_clean)

    # Feature-space fast path: families with a parameter-free extractor
    # (ModelSpec.featurize/head_apply, e.g. logcov) featurize the data
    # ONCE and train every epoch in head space — identical math
    # (apply == head_apply(featurize)), ~10x faster epochs. The mesh path
    # keeps the full apply (its shardings are window-shaped).
    if spec is not None and spec.featurize is not None and mesh is None:
        _feat = jax.jit(spec.featurize)
        x_train = np.asarray(_feat(init_params, jnp.asarray(x_train)))
        x_val = np.asarray(_feat(init_params, jnp.asarray(x_val)))
        model_for_step = (
            lambda p, f, *, train=False, rng=None: spec.head_apply(
                p, f, train=train, rng=rng
            )
        )

    steps_per_epoch = max(1, x_train.shape[0] // max(1, train_cfg.batch_size))
    optimizer = _optimizer(train_cfg, steps_per_epoch)
    opt_state = optimizer.init(init_params)
    step_fn = make_train_step(model_for_step, optimizer, train_cfg.label_smoothing)
    eval_fn = make_eval_fn(model_for_step)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from neural_speech_decoding_tpu.parallel.sharding import batch_sharding

        repl = NamedSharding(mesh, P())
        step_fn = jax.jit(
            step_fn,
            in_shardings=(repl, repl, batch_sharding(mesh), batch_sharding(mesh, 1), repl),
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1),
        )
        eval_fn = jax.jit(
            eval_fn,
            in_shardings=(
                repl,
                batch_sharding(mesh),
                batch_sharding(mesh, 1),
                batch_sharding(mesh, 1),
            ),
        )
        params = jax.device_put(init_params, repl)
        opt_state = jax.device_put(opt_state, repl)
        # pad batches to a multiple of dp
        dp = mesh.shape["dp"]
        bs = max(dp, (train_cfg.batch_size // dp) * dp)
        x_val, w_val = _pad_to_multiple(x_val, dp)
        y_val, _ = _pad_to_multiple(y_val, dp)
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0, 1))
        eval_fn = jax.jit(eval_fn)
        params = init_params
        bs = train_cfg.batch_size
        w_val = np.ones(x_val.shape[0], np.float32)

    start_epoch = 0
    if train_cfg.checkpoint_dir:
        from neural_speech_decoding_tpu.train import checkpointing as ckpt

        if train_cfg.resume:
            last = ckpt.latest_epoch(train_cfg.checkpoint_dir)
            if last is not None:
                start_epoch, params, opt_state = ckpt.restore_train_state(
                    train_cfg.checkpoint_dir, params, opt_state
                )
                start_epoch += 1
                if verbose:
                    print(f"resumed from epoch {start_epoch - 1}", flush=True)

    history: List[Dict[str, float]] = []
    best_acc, best_params = -1.0, None
    epochs_since_best = 0
    n = x_train.shape[0]
    np_rng = np.random.default_rng(train_cfg.seed + start_epoch)
    t0 = time.perf_counter()
    for epoch in range(start_epoch, train_cfg.epochs):
        perm = np_rng.permutation(n)
        losses, accs = [], []
        for i in range(0, n - bs + 1, bs):
            idx = perm[i : i + bs]
            rng, k = jax.random.split(rng)
            params, opt_state, m = step_fn(
                params, opt_state, x_train[idx], y_train[idx], k
            )
            losses.append(float(m["loss"]))
            accs.append(float(m["accuracy"]))
        val_m = eval_fn(params, x_val, y_val, w_val)
        rec = {
            "epoch": epoch,
            "train_loss": float(np.mean(losses)) if losses else float("nan"),
            "train_accuracy": float(np.mean(accs)) if accs else float("nan"),
            "val_loss": float(val_m["loss"]),
            "val_accuracy": float(val_m["accuracy"]),
            "wall_s": time.perf_counter() - t0,
        }
        history.append(rec)
        if rec["val_accuracy"] > best_acc:
            epochs_since_best = 0
        else:
            epochs_since_best += 1
        if train_cfg.keep_best and rec["val_accuracy"] >= best_acc:
            best_acc = rec["val_accuracy"]
            best_params = jax.tree_util.tree_map(np.asarray, params)
        if verbose and (epoch % 10 == 0 or epoch == train_cfg.epochs - 1):
            print(
                f"epoch {epoch:3d} loss {rec['train_loss']:.4f} "
                f"acc {rec['train_accuracy']:.3f} val_acc {rec['val_accuracy']:.3f}",
                flush=True,
            )
        if train_cfg.checkpoint_dir and (
            (epoch + 1) % train_cfg.checkpoint_every == 0
            or epoch == train_cfg.epochs - 1
        ):
            from neural_speech_decoding_tpu.train import checkpointing as ckpt

            ckpt.save_train_state(
                train_cfg.checkpoint_dir, epoch, params, opt_state
            )
        if (
            train_cfg.early_stop_patience > 0
            and epochs_since_best >= train_cfg.early_stop_patience
        ):
            if verbose:
                print(f"early stop at epoch {epoch} (patience "
                      f"{train_cfg.early_stop_patience})", flush=True)
            break
    if train_cfg.keep_best and best_params is not None:
        return best_params, history
    return params, history
