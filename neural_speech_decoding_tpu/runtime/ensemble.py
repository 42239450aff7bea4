"""Ensemble inference: K same-family checkpoints decoded in one pass.

The accuracy flagship (docs/BENCHMARKS.md) is a seed ensemble: K models
trained from different seeds whose softmax probabilities are averaged
(tools/crossval.py --seeds). This engine is its deployment counterpart.
The reference has no ensemble machinery (its SimplePredictor holds exactly
one checkpoint, lstm_eeg_model.py:42-101); this is a parity-plus surface
with the same predict contract.

TPU mapping: member parameters are STACKED into one pytree (leading axis =
member) and the decoder is `jax.vmap`-ed over that axis, so the whole
ensemble is still ONE jitted executable — the Kuramoto filter runs once
per window (it is model-independent), the K decoder evaluations batch
their matmuls on the MXU, and the mean-softmax reduction happens on
device. No Python loop over members at decode time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neural_speech_decoding_tpu.config import FilterConfig, PipelineConfig
from neural_speech_decoding_tpu.models.lstm import decoder_apply
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
from neural_speech_decoding_tpu.runtime.engine import _ServingBase


def _load(path: str):
    if str(path).endswith(".npz"):
        from neural_speech_decoding_tpu.io.params_io import load_params_npz

        return load_params_npz(path)
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params

    return load_decoder_params(path)


def stack_params(members: Sequence) -> object:
    """Stack K structurally-identical param pytrees along a new leading
    axis. Raises if the members disagree in structure or leaf shapes."""
    if not members:
        raise ValueError("need at least one ensemble member")
    treedefs = {str(jax.tree_util.tree_structure(m)) for m in members}
    if len(treedefs) != 1:
        raise ValueError(f"ensemble members differ in structure: {treedefs}")
    shapes = [
        tuple(np.shape(leaf) for leaf in jax.tree_util.tree_leaves(m))
        for m in members
    ]
    if len(set(shapes)) != 1:
        raise ValueError("ensemble members differ in leaf shapes")
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)


def _combine_soft(soft: jnp.ndarray, how: str) -> jnp.ndarray:
    """[K, B, C] member softmaxes -> [B, C]. "median" renormalizes (the
    per-class median of simplex points is not itself on the simplex);
    argmax semantics match tools/aggregator_study.py's replay exactly."""
    if how == "median":
        med = jnp.median(soft, axis=0)
        return med / jnp.sum(med, axis=-1, keepdims=True)
    return jnp.mean(soft, axis=0)


def _identical_whiteners(params_list) -> bool:
    """True when every member's non-trainable whitener buffer is identical
    (or absent everywhere) — the condition under which the family's feature
    extractor is the same function of the input for all members, so
    features can be extracted once and only the heads vmapped."""
    if not all(isinstance(p, dict) for p in params_list):
        return False
    ws = [p.get("whitener") for p in params_list]
    if all(w is None for w in ws):
        return True
    if all(w is not None for w in ws):
        w0 = np.asarray(ws[0])
        return all(np.array_equal(np.asarray(w), w0) for w in ws[1:])
    return False


class EnsembleEngine(_ServingBase):
    """Same predict surface as InferenceEngine, over K checkpoints.

    `model_paths` may mix .npz (native pytrees) and .pth (reference
    format, LSTM families only) as long as every member is the same model
    family with identical shapes — OR `model` may name a cross-family mix
    ("logcov8+logcov12", the tools/crossval.py ensemble syntax), in which
    case members group by family, each group decodes in one vmapped pass,
    and the mean-softmax runs over all members of all groups.
    """

    def __init__(
        self,
        model_paths: Optional[Sequence[str]] = None,
        *,
        params_list: Optional[Sequence] = None,
        model: str = "lstm",
        config: Optional[PipelineConfig] = None,
        class_names: Optional[Sequence[str]] = None,
        turbo: bool = False,
        model_kw: Optional[dict] = None,
        mesh=None,
        shard_members: bool = False,
        share_features: str = "auto",
        families: Optional[Sequence[str]] = None,
        combine: str = "mean",
    ):
        """`mesh`: a jax.sharding.Mesh with 'dp' (and optionally 'tp')
        axes — the serving pass then shards the window batch over 'dp'
        (GSPMD partitions the filter + per-member decode; the only
        cross-device math is whatever the model itself requires). With
        `shard_members=True` the stacked member axis is additionally
        sharded over 'tp' (requires num_members % tp == 0), so the K
        decoder evaluations spread over devices and the mean-softmax
        reduction becomes one ICI collective. Without a mesh the whole
        ensemble runs on the default device (single-chip serving).

        `share_features="auto"` (default): when the family exposes a
        parameter-free feature extractor (ModelSpec.featurize_ex) and
        every member carries the SAME non-trainable whitener buffer (or
        none) — true for seed ensembles, whose fit_whitener is
        deterministic on the shared training data — features are
        extracted ONCE and only the tiny heads are vmapped over members,
        instead of K full band-covariance + Clenshaw-logm passes.
        Identical probabilities and flags by construction (equality
        test: tests/test_ensemble.py). "never" forces the per-member
        pipeline.

        `combine`: how the K member softmaxes collapse to one probability
        vector. "mean" (default) is the deployed combiner — the
        reference-protocol generalization every accuracy table uses.
        "median" (renormalized per-class median over members) is the
        robust alternative measured by tools/aggregator_study.py: +1.3
        session-level points on the 3-class deployment config (6/6 fold
        seeds) but neutral elsewhere, so it ships as an option, not the
        default (docs/BENCHMARKS.md "Ensemble combiner study")."""
        from neural_speech_decoding_tpu.models.registry import get_model

        if combine not in ("mean", "median"):
            raise ValueError(f"unknown combine {combine!r}")
        self.combine = combine
        if params_list is None:
            if not model_paths:
                raise ValueError("need model_paths or params_list")
            params_list = [_load(p) for p in model_paths]
        fam_names = [f.strip() for f in model.split("+") if f.strip()]
        if len(fam_names) > 1 or families is not None:
            self._init_mixed(
                params_list, fam_names, families, config=config,
                class_names=class_names, turbo=turbo, model_kw=model_kw,
                mesh=mesh, shard_members=shard_members,
                share_features=share_features, combine=combine,
            )
            return
        spec = get_model(model, **(model_kw or {}))
        # fast-filter serving default — same rationale and numbers as
        # InferenceEngine (runtime/engine.py): in f32 the modes differ only
        # in the 8x8 solve, and the LU path costs 2.3x the filter on TPU.
        config = config or PipelineConfig(
            class_names=spec.class_names,
            decoder=spec.config
            if model.startswith("lstm")
            else PipelineConfig().decoder,
            filter=FilterConfig(precision="fast"),
        )
        self.config = config
        self.class_names = tuple(class_names or config.class_names)
        self.num_members = len(params_list)
        stacked = stack_params(params_list)
        self._mesh = mesh
        self._pad_multiple = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._pad_multiple = int(mesh.shape["dp"])
            if shard_members:
                tp = int(mesh.shape.get("tp", 1))
                if self.num_members % tp:
                    raise ValueError(
                        f"shard_members needs num_members ({self.num_members}) "
                        f"divisible by the mesh 'tp' axis ({tp})"
                    )
                self.params = jax.tree_util.tree_map(
                    lambda leaf: jax.device_put(
                        leaf,
                        NamedSharding(
                            mesh, P("tp", *([None] * (jnp.ndim(leaf) - 1)))
                        ),
                    ),
                    stacked,
                )
            else:
                self.params = jax.device_put(stacked, NamedSharding(mesh, P()))
        else:
            self.params = jax.device_put(stacked)

        filter_cfg = config.filter
        decoder_cfg = config.decoder
        if turbo:
            decoder_cfg = dataclasses.replace(
                decoder_cfg, recurrence_dtype="bfloat16"
            )
        self._has_aux = (not model.startswith("lstm")) and spec.apply_ex is not None
        # shared featurization: valid when every member's feature
        # extractor is the same function of the input — i.e. the only
        # featurize-relevant pytree leaf (the fitted whitener buffer) is
        # identical across members, or absent everywhere
        self._shared_featurize = (
            share_features == "auto"
            and self._has_aux
            and spec.featurize_ex is not None
            and spec.head_apply is not None
            and self.num_members > 1
            and _identical_whiteners(params_list)
        )
        if model.startswith("lstm"):
            apply_fn = lambda p, x: decoder_apply(p, x, decoder_cfg, train=False)  # noqa: E731
        else:
            apply_fn = lambda p, x: spec.apply(p, x, train=False)  # noqa: E731

        # Pallas-route mesh handling (rationale in InferenceEngine): with
        # params replicated the WHOLE pipeline shard_maps over 'dp' below;
        # with member-sharded params (shard_members) the member axis must
        # stay under GSPMD, so only the filter is shard_map'd over 'dp' —
        # logcov's fused feats kernel is then still at risk on a real
        # multi-chip mesh; serve member-sharded covariance ensembles with
        # LogCovConfig(fused="stages") there.
        if mesh is not None and shard_members:
            from neural_speech_decoding_tpu.ops.kuramoto import (
                mai_filter_batch_sharded,
            )

            _filt = lambda w: mai_filter_batch_sharded(  # noqa: E731
                w, filter_cfg, mesh=mesh
            )
        else:
            _filt = lambda w: mai_filter_batch(w, filter_cfg)  # noqa: E731

        if self._has_aux and self._shared_featurize:

            def _pipeline(stacked, windows_btc: jnp.ndarray):
                filtered = _filt(windows_btc)
                # identical whiteners -> identical features and flags for
                # every member: extract once, vmap only the heads
                p0 = jax.tree_util.tree_map(lambda leaf: leaf[0], stacked)
                feats, flags = spec.featurize_ex(p0, filtered)
                logits = jax.vmap(
                    lambda p: spec.head_apply(p, feats, train=False)
                )(stacked)
                probs = _combine_soft(jax.nn.softmax(logits, axis=-1), combine)
                return probs, flags

        elif self._has_aux:

            def _pipeline(stacked, windows_btc: jnp.ndarray):
                filtered = _filt(windows_btc)
                logits, aux = jax.vmap(
                    lambda p, x: spec.apply_ex(p, x, train=False),
                    in_axes=(0, None),
                )(stacked, filtered)
                probs = _combine_soft(jax.nn.softmax(logits, axis=-1), combine)
                # a window is flagged if ANY member's whitener pushed its
                # covariance out of the Chebyshev domain
                return probs, jnp.any(aux["domain_flags"], axis=0)

        else:

            def _pipeline(stacked, windows_btc: jnp.ndarray) -> jnp.ndarray:
                filtered = _filt(windows_btc)
                logits = jax.vmap(apply_fn, in_axes=(0, None))(stacked, filtered)
                return _combine_soft(jax.nn.softmax(logits, axis=-1), combine)

        if mesh is not None and not shard_members:
            # replicated members: whole-pipeline shard_map over 'dp' so
            # the Pallas routes run per-shard (see the note above)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            out_specs = (P("dp"), P("dp")) if self._has_aux else P("dp")
            self._pipeline = jax.jit(
                shard_map(
                    _pipeline,
                    mesh=mesh,
                    in_specs=(P(), P("dp", None, None)),
                    out_specs=out_specs,
                    check_vma=False,
                )
            )
        elif mesh is not None:
            from neural_speech_decoding_tpu.parallel.sharding import (
                batch_sharding,
            )

            # params keep their placed sharding (None = "as given"); the
            # window batch shards over 'dp' even when fed as host numpy
            self._pipeline = jax.jit(
                _pipeline, in_shardings=(None, batch_sharding(mesh))
            )
        else:
            self._pipeline = jax.jit(_pipeline)
        self._init_serving()

    def _init_mixed(
        self,
        params_list: Sequence,
        fam_names: Sequence[str],
        families: Optional[Sequence[str]],
        *,
        config: Optional[PipelineConfig],
        class_names: Optional[Sequence[str]],
        turbo: bool,
        model_kw: Optional[dict],
        mesh,
        shard_members: bool,
        share_features: str,
        combine: str = "mean",
    ) -> None:
        """Cross-family ensemble serving: members group by family, each
        group is stacked + vmapped (with the shared-featurization fast
        path per group when its whiteners agree), and mean-softmax runs
        over ALL members inside ONE jitted pipeline — the Kuramoto filter
        still runs exactly once per window. This is the deployment
        counterpart of tools/crossval.py's "famA+famB" mixes (per-family
        overrides via the same "fam:key=value" model_kw routing)."""
        from neural_speech_decoding_tpu.models.registry import (
            family_model_kw,
            get_model,
        )

        if turbo or shard_members:
            raise ValueError(
                "turbo/shard_members are not supported for mixed-family "
                "ensembles"
            )
        if families is None:
            if not fam_names:
                raise ValueError("need a model string or explicit families")
            k, rem = divmod(len(params_list), len(fam_names))
            if rem or k == 0:
                raise ValueError(
                    f"{len(params_list)} members do not split evenly over "
                    f"families {fam_names}; pass families= explicitly"
                )
            # crossval/fit_ensemble member order: k members per family,
            # grouped in family order
            families = [f for f in fam_names for _ in range(k)]
        families = [str(f) for f in families]
        if len(families) != len(params_list):
            raise ValueError(
                f"families ({len(families)}) must parallel members "
                f"({len(params_list)})"
            )
        self.num_members = len(params_list)
        self.families = tuple(families)

        group_order = list(dict.fromkeys(families))
        groups = []  # (spec, has_aux, shared_featurize, k) per family
        stacked_groups = []
        for fam in group_order:
            spec = get_model(fam, **family_model_kw(model_kw, fam))
            plist = [
                p for p, f in zip(params_list, families) if f == fam
            ]
            has_aux = (
                not fam.startswith("lstm")
            ) and spec.apply_ex is not None
            shared = (
                share_features == "auto"
                and has_aux
                and spec.featurize_ex is not None
                and spec.head_apply is not None
                and len(plist) > 1
                and _identical_whiteners(plist)
            )
            groups.append((spec, has_aux, shared, len(plist)))
            stacked_groups.append(stack_params(plist))

        name_sets = {tuple(g[0].class_names) for g in groups}
        if len(name_sets) != 1:
            raise ValueError(
                f"mixed-family members disagree on class names: {name_sets}"
            )
        spec0 = groups[0][0]
        config = config or PipelineConfig(
            class_names=spec0.class_names,
            filter=FilterConfig(precision="fast"),
        )
        self.config = config
        self.class_names = tuple(class_names or config.class_names)
        self._has_aux = any(g[1] for g in groups)
        self._shared_featurize = tuple(g[2] for g in groups)
        self._mesh = mesh
        self._pad_multiple = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._pad_multiple = int(mesh.shape["dp"])
            replicated = NamedSharding(mesh, P())
            stacked_groups = [
                jax.device_put(s, replicated) for s in stacked_groups
            ]
        else:
            stacked_groups = [jax.device_put(s) for s in stacked_groups]
        self.params = tuple(stacked_groups)

        filter_cfg = config.filter
        has_aux_any = self._has_aux

        def _pipeline(group_params, windows_btc: jnp.ndarray):
            filtered = mai_filter_batch(windows_btc, filter_cfg)
            softs = []  # per-group [k, B, C] member softmaxes
            flags = None
            # static Python loop over families: traced once, each group's
            # member axis stays a single vmapped MXU batch
            for (spec_, aux_, shared_, _k), stacked in zip(
                groups, group_params
            ):
                if shared_:
                    p0 = jax.tree_util.tree_map(lambda l: l[0], stacked)
                    feats, f = spec_.featurize_ex(p0, filtered)
                    logits = jax.vmap(
                        lambda p: spec_.head_apply(p, feats, train=False)
                    )(stacked)
                elif aux_:
                    logits, aux = jax.vmap(
                        lambda p: spec_.apply_ex(p, filtered, train=False)
                    )(stacked)
                    f = jnp.any(aux["domain_flags"], axis=0)
                else:
                    logits = jax.vmap(
                        lambda p: spec_.apply(p, filtered, train=False)
                    )(stacked)
                    f = None
                softs.append(jax.nn.softmax(logits, axis=-1))
                if f is not None:
                    flags = f if flags is None else flags | f
            # combine over ALL members of all groups at once (median needs
            # the full member axis; mean over the concat equals the old
            # incremental sum / num_members)
            probs = _combine_soft(jnp.concatenate(softs, axis=0), combine)
            if has_aux_any:
                if flags is None:
                    flags = jnp.zeros(windows_btc.shape[0], bool)
                return probs, flags
            return probs

        if mesh is not None:
            # mixed-family members are always replicated: whole-pipeline
            # shard_map over 'dp' (Pallas routes run per-shard — see the
            # single-family __init__)
            from jax import shard_map
            from jax.sharding import PartitionSpec as P

            out_specs = (P("dp"), P("dp")) if has_aux_any else P("dp")
            self._pipeline = jax.jit(
                shard_map(
                    _pipeline,
                    mesh=mesh,
                    in_specs=(P(), P("dp", None, None)),
                    out_specs=out_specs,
                    check_vma=False,
                )
            )
        else:
            self._pipeline = jax.jit(_pipeline)
        self._init_serving()

    @classmethod
    def from_manifest(cls, manifest_path: str, **kw) -> "EnsembleEngine":
        """Build from a tools/fit_ensemble.py manifest JSON (member paths
        are resolved relative to the manifest's directory)."""
        import json
        from pathlib import Path

        mpath = Path(manifest_path)
        manifest = json.loads(mpath.read_text())
        members = []
        for p in manifest["members"]:
            cand = Path(p)
            if not cand.is_absolute():
                # relative to the manifest's directory; fit_ensemble writes
                # repo-root-relative paths, so fall back to basename next to
                # the manifest for a relocated checkpoints/ directory
                rel = mpath.parent / cand
                cand = rel if rel.exists() else mpath.parent / cand.name
            members.append(str(cand))
        if len(set(members)) != len(members):
            raise ValueError(
                f"manifest members collapse to duplicate paths: {members}"
            )
        kw.setdefault("model", manifest.get("model", "lstm"))
        kw.setdefault(
            "model_kw", manifest.get("config", {}).get("model_kw") or None
        )
        if manifest.get("families"):
            kw.setdefault("families", manifest["families"])
        if kw["model"] == "lstm":
            # reference class-name quirk (reference tester.py:85): every
            # lstm serving path labels class 2 "None"; manifest serving
            # matches the InferenceEngine branches instead of falling back
            # to the spec's "BG-Noise" spelling
            kw.setdefault("class_names", ("Food", "Water", "None"))
        return cls(members, **kw)

    # the public API (stats / warmup / predict_batch / predict /
    # predict_batch_async) is the shared InferenceEngine contract,
    # inherited from _ServingBase
