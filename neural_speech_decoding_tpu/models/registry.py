"""Model registry: every decoder family behind one (init, apply) surface.

BASELINE.json's config matrix — 3-class LSTM (reference parity), 5-class
LSTM (re-adding Yes/No), EEGNet-style conv encoder, transformer encoder —
all resolve here to a uniform functional interface so run_trials, the
training loop, and the benchmark swap families by name.

  apply(params, x_btc, *, train=False, rng=None) -> logits [B, classes]
  init(rng) -> params pytree
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax

from neural_speech_decoding_tpu.config import (
    DecoderConfig,
    FIVE_CLASS_NAMES,
    THREE_CLASS_NAMES,
)
from neural_speech_decoding_tpu.models import eegnet as _eegnet
from neural_speech_decoding_tpu.models import logcov as _logcov
from neural_speech_decoding_tpu.models import lru as _lru
from neural_speech_decoding_tpu.models import lstm as _lstm
from neural_speech_decoding_tpu.models import tcn as _tcn
from neural_speech_decoding_tpu.models import transformer as _transformer


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    name: str
    config: Any
    class_names: Tuple[str, ...]
    init: Callable[[jax.Array], Any]
    apply: Callable[..., Any]  # (params, x, *, train=False, rng=None)
    # optional data-dependent initialization: (params, x_train, y_train) ->
    # params, run ONCE on TRAINING data after init (e.g. the logcov
    # tangent-point whitener). Callers (train loop, crossval) invoke it
    # right after spec.init; it must never see evaluation data.
    fit: "Callable[[Any, Any, Any], Any] | None" = None
    # optional extended apply: (params, x, *, train, rng) -> (logits, aux)
    # where aux is a dict of per-window diagnostics (e.g. the logcov
    # spectrum-guard "domain_flags"). Serving engines use it when present
    # to surface runtime health counters; apply stays the plain surface.
    apply_ex: "Callable[..., Any] | None" = None
    # optional feature-space split for families whose feature extractor is
    # parameter-free: featurize(params, x) -> feats computed ONCE per
    # window, head_apply(params, feats, *, train, rng) -> logits run every
    # training step. apply == head_apply(featurize(...)) exactly; training
    # pipelines (crossval) use the split to avoid re-extracting features
    # each step.
    featurize: "Callable[[Any, Any], Any] | None" = None
    head_apply: "Callable[..., Any] | None" = None
    # featurize + aux flags: featurize_ex(params, x) -> (feats, flags [B]
    # bool). Lets ensemble serving extract features ONCE when every
    # member's feature extractor is identical (same/no whitener buffer)
    # and vmap only the tiny heads (runtime/ensemble.py share_features).
    featurize_ex: "Callable[[Any, Any], Any] | None" = None


def _lstm_spec(name: str, num_classes: int, class_names, **cfg_kw) -> "ModelSpec":
    cfg = DecoderConfig(num_classes=num_classes, **cfg_kw)
    return ModelSpec(
        name=name,
        config=cfg,
        class_names=tuple(class_names),
        init=lambda rng: _lstm.init_decoder_params(rng, cfg),
        apply=lambda p, x, *, train=False, rng=None: _lstm.decoder_apply(
            p, x, cfg, train=train, rng=rng
        ),
    )


def _eegnet_spec(name: str, num_classes: int, class_names, **cfg_kw) -> "ModelSpec":
    cfg = _eegnet.EEGNetConfig(num_classes=num_classes, **cfg_kw)
    return ModelSpec(
        name=name,
        config=cfg,
        class_names=tuple(class_names),
        init=lambda rng: _eegnet.init_eegnet_params(rng, cfg),
        apply=lambda p, x, *, train=False, rng=None: _eegnet.eegnet_apply(
            p, x, cfg, train=train, rng=rng
        ),
    )


def _tcn_spec(name: str, num_classes: int, class_names, **cfg_kw) -> "ModelSpec":
    cfg = _tcn.TCNConfig(num_classes=num_classes, **cfg_kw)
    return ModelSpec(
        name=name,
        config=cfg,
        class_names=tuple(class_names),
        init=lambda rng: _tcn.init_tcn_params(rng, cfg),
        apply=lambda p, x, *, train=False, rng=None: _tcn.tcn_apply(
            p, x, cfg, train=train, rng=rng
        ),
    )


def _transformer_spec(
    name: str, num_classes: int, class_names, **cfg_kw
) -> "ModelSpec":
    cfg = _transformer.TransformerConfig(num_classes=num_classes, **cfg_kw)
    return ModelSpec(
        name=name,
        config=cfg,
        class_names=tuple(class_names),
        init=lambda rng: _transformer.init_transformer_params(rng, cfg),
        apply=lambda p, x, *, train=False, rng=None: _transformer.transformer_apply(
            p, x, cfg, train=train, rng=rng
        ),
    )


def _lru_spec(name: str, num_classes: int, class_names, **cfg_kw) -> "ModelSpec":
    cfg = _lru.LRUConfig(num_classes=num_classes, **cfg_kw)
    return ModelSpec(
        name=name,
        config=cfg,
        class_names=tuple(class_names),
        init=lambda rng: _lru.init_lru_params(rng, cfg),
        apply=lambda p, x, *, train=False, rng=None: _lru.lru_apply(
            p, x, cfg, train=train, rng=rng
        ),
    )


def _logcov_spec(name: str, num_classes: int, class_names, **cfg_kw) -> "ModelSpec":
    cfg = _logcov.LogCovConfig(num_classes=num_classes, **cfg_kw)
    return ModelSpec(
        name=name,
        config=cfg,
        class_names=tuple(class_names),
        init=lambda rng: _logcov.init_logcov_params(rng, cfg),
        apply=lambda p, x, *, train=False, rng=None: _logcov.logcov_apply(
            p, x, cfg, train=train, rng=rng
        ),
        fit=(
            (lambda p, x, y=None: _logcov.fit_whitener(p, x, y, cfg=cfg))
            if cfg.whiten
            else None
        ),
        apply_ex=lambda p, x, *, train=False, rng=None: _logcov.logcov_apply_ex(
            p, x, cfg, train=train, rng=rng
        ),
        featurize=lambda p, x: _logcov.logcov_features(
            x, cfg, whitener=p.get("whitener")
        ),
        head_apply=lambda p, f, *, train=False, rng=None: _logcov.logcov_head_apply(
            p, f, cfg, train=train, rng=rng
        ),
        featurize_ex=lambda p, x: _logcov.logcov_features(
            x, cfg, whitener=p.get("whitener"), with_flags=True
        ),
    )


_NARROW_BANDS = (
    (3.0, 6.0), (6.0, 9.0), (9.0, 13.0), (13.0, 18.0),
    (18.0, 24.0), (24.0, 32.0), (32.0, 40.0), (40.0, 48.0),
)

_BUILDERS: Dict[str, Callable[..., ModelSpec]] = {
    "lstm": lambda **kw: _lstm_spec("lstm", 3, THREE_CLASS_NAMES, **kw),
    "lstm5": lambda **kw: _lstm_spec("lstm5", 5, FIVE_CLASS_NAMES, **kw),
    "eegnet": lambda **kw: _eegnet_spec("eegnet", 3, THREE_CLASS_NAMES, **kw),
    "eegnet5": lambda **kw: _eegnet_spec("eegnet5", 5, FIVE_CLASS_NAMES, **kw),
    "transformer": lambda **kw: _transformer_spec(
        "transformer", 3, THREE_CLASS_NAMES, **kw
    ),
    "transformer5": lambda **kw: _transformer_spec(
        "transformer5", 5, FIVE_CLASS_NAMES, **kw
    ),
    "tcn": lambda **kw: _tcn_spec("tcn", 3, THREE_CLASS_NAMES, **kw),
    "tcn5": lambda **kw: _tcn_spec("tcn5", 5, FIVE_CLASS_NAMES, **kw),
    # linear recurrent unit / state-space family (models/lru.py):
    # diagonal complex recurrence via associative_scan — log-depth over
    # T=625 where the LSTM is serial
    "lru": lambda **kw: _lru_spec("lru", 3, THREE_CLASS_NAMES, **kw),
    "lru5": lambda **kw: _lru_spec("lru5", 5, FIVE_CLASS_NAMES, **kw),
    # capacity variants for the tiny-dataset regime (179 trials): a small,
    # harder-regularized stack and a wide one, CV-compared in BENCHMARKS
    "tcn_small": lambda **kw: _tcn_spec(
        "tcn_small", 3, THREE_CLASS_NAMES,
        **{"width": 32, "blocks": 4, "dropout": 0.45, **kw},
    ),
    "tcn_wide": lambda **kw: _tcn_spec(
        "tcn_wide", 3, THREE_CLASS_NAMES, **{"width": 64, "dropout": 0.4, **kw}
    ),
    # filter-bank log-covariance (tangent-space) family — the classical
    # small-sample EEG approach, models/logcov.py
    "logcov": lambda **kw: _logcov_spec("logcov", 3, THREE_CLASS_NAMES, **kw),
    "logcov5": lambda **kw: _logcov_spec("logcov5", 5, FIVE_CLASS_NAMES, **kw),
    # 8 narrow bands (288 features) — finer spectral resolution
    "logcov8": lambda **kw: _logcov_spec(
        "logcov8", 3, THREE_CLASS_NAMES, **{"bands": _NARROW_BANDS, **kw}
    ),
    # 12 bands: the 4 broad rhythms PLUS the 8 narrow slices (432 features)
    # — multi-resolution spectral view
    "logcov12": lambda **kw: _logcov_spec(
        "logcov12", 3, THREE_CLASS_NAMES,
        **{
            "bands": tuple(_logcov.LogCovConfig().bands) + _NARROW_BANDS,
            **kw,
        },
    ),
    # 5-class narrow-band variant — the strongest decoder on the full
    # yes/no/water/food/bg vocabulary the reference abandoned (33.3% nested
    # CV vs 20% chance; docs/BENCHMARKS.md)
    "logcov8_5": lambda **kw: _logcov_spec(
        "logcov8_5", 5, FIVE_CLASS_NAMES, **{"bands": _NARROW_BANDS, **kw}
    ),
    # 5-class multi-resolution variant (broad + narrow bands), the 5-class
    # counterpart of logcov12 — exists so the band-diversity ensemble that
    # lifted 3-class CV (logcov8+logcov12) can be screened on 5 classes too
    "logcov12_5": lambda **kw: _logcov_spec(
        "logcov12_5", 5, FIVE_CLASS_NAMES,
        **{
            "bands": tuple(_logcov.LogCovConfig().bands) + _NARROW_BANDS,
            **kw,
        },
    ),
}


def available_models() -> Tuple[str, ...]:
    return tuple(sorted(_BUILDERS))


def parse_model_kw(pairs) -> Dict[str, Any]:
    """CLI "--model-kw KEY=VALUE" strings -> config-override dict: values
    parse as JSON (falling back to string), dashes become underscores,
    get_model freezes lists. Shared by every CLI that exposes the flag
    (crossval, fit_ensemble, tester, train)."""
    import json

    kw: Dict[str, Any] = {}
    for pair in pairs:
        key, eq, raw = pair.partition("=")
        if not eq:
            raise SystemExit(f"--model-kw expects KEY=VALUE, got {pair!r}")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        kw[key.replace("-", "_")] = val
    return kw


def family_model_kw(model_kw, name: str) -> Dict[str, Any]:
    """Resolve per-family config overrides for a cross-family ensemble.

    "logcov8_5:whiten=true" applies only to that family (a bare
    "whiten=true" would crash families whose config lacks the field);
    unprefixed keys go to every family. Shared by tools/crossval.py
    (training-time mixes) and runtime/ensemble.py (serving them)."""
    kw: Dict[str, Any] = {}
    for k, v in (model_kw or {}).items():
        fam, sep, sub = k.partition(":")
        if sep:
            if fam == name:
                kw[sub] = v
        else:
            kw[k] = v
    return kw


def _freeze(value: Any) -> Any:
    """JSON-decoded override values -> hashable (lists become tuples), so
    frozen dataclass configs keep working as jit statics / cache keys."""
    if isinstance(value, list):
        return tuple(_freeze(v) for v in value)
    return value


def get_model(name: str, **cfg_kw: Any) -> ModelSpec:
    """Resolve a registered family, optionally overriding config fields
    (e.g. get_model("logcov8", shrinkage=0.1)); overrides win over the
    entry's own defaults. List-valued overrides (e.g. band edges decoded
    from JSON) are frozen to tuples."""
    try:
        builder = _BUILDERS[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {', '.join(available_models())}"
        ) from None
    return builder(**{k: _freeze(v) for k, v in cfg_kw.items()})
