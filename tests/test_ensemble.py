"""EnsembleEngine: stacked-params vmapped decode + mean-softmax contract."""

import jax
import numpy as np
import pytest

from neural_speech_decoding_tpu.io.params_io import save_params_npz
from neural_speech_decoding_tpu.models.registry import get_model
from neural_speech_decoding_tpu.runtime.engine import InferenceEngine
from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine, stack_params


@pytest.fixture(scope="module")
def member_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ensemble")
    spec = get_model("tcn_small")
    paths = []
    for s in range(3):
        params = spec.init(jax.random.PRNGKey(s))
        p = tmp / f"member{s}.npz"
        save_params_npz(p, params)
        paths.append(str(p))
    return paths


def test_ensemble_is_mean_of_members(member_paths, dataset):
    windows = dataset.windows[:4]
    ens = EnsembleEngine(member_paths, model="tcn_small")
    ens_probs = ens.predict_batch(windows)
    member_probs = [
        InferenceEngine(p, model="tcn_small").predict_batch(windows)
        for p in member_paths
    ]
    np.testing.assert_allclose(
        ens_probs, np.mean(member_probs, axis=0), atol=1e-6
    )
    assert ens.num_members == 3
    np.testing.assert_allclose(ens_probs.sum(axis=1), 1.0, atol=1e-5)


def test_ensemble_predict_contract(member_paths, dataset):
    ens = EnsembleEngine(member_paths, model="tcn_small")
    probs, label = ens.predict(dataset.windows[0])
    assert probs.dtype == np.float32
    assert probs.shape == (len(ens.class_names),)
    assert label in ens.class_names


def test_singleton_pth_ensemble_matches_engine(checkpoint_path, dataset):
    """An ensemble of one reference .pth decodes exactly like the plain
    engine (same pipeline up to the trivial mean)."""
    windows = dataset.windows[:4]
    ens = EnsembleEngine([str(checkpoint_path)], model="lstm")
    eng = InferenceEngine(str(checkpoint_path))
    np.testing.assert_allclose(
        ens.predict_batch(windows), eng.predict_batch(windows), atol=1e-6
    )


def test_stack_params_rejects_mismatch():
    spec_a = get_model("tcn_small")
    spec_b = get_model("tcn_wide")
    a = spec_a.init(jax.random.PRNGKey(0))
    b = spec_b.init(jax.random.PRNGKey(1))
    with pytest.raises(ValueError):
        stack_params([a, b])
    with pytest.raises(ValueError):
        stack_params([])


def test_from_manifest(member_paths, dataset, tmp_path):
    import json
    from pathlib import Path

    manifest = tmp_path / "ens_manifest.json"
    # member files live elsewhere; from_manifest resolves by name relative
    # to the manifest dir, so copy them next to it
    for p in member_paths:
        (tmp_path / Path(p).name).write_bytes(Path(p).read_bytes())
    manifest.write_text(
        json.dumps({"model": "tcn_small", "members": [Path(p).name for p in member_paths]})
    )
    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    ens = EnsembleEngine.from_manifest(str(manifest))
    direct = EnsembleEngine(member_paths, model="tcn_small")
    w = dataset.windows[:2]
    np.testing.assert_allclose(
        ens.predict_batch(w), direct.predict_batch(w), atol=1e-6
    )


def test_empty_batch(member_paths):
    ens = EnsembleEngine(member_paths, model="tcn_small")
    out = ens.predict_batch(np.zeros((0, 625, 8), np.float32))
    assert out.shape == (0, len(ens.class_names))


def test_from_manifest_model_kw_roundtrip(tmp_path, dataset):
    """fit_ensemble manifests carry model_kw; from_manifest rebuilds the
    same (overridden) config so the stacked params actually fit it."""
    import json

    spec = get_model("logcov", bands=[[3.0, 10.0], [10.0, 48.0]])
    paths = []
    for s in range(2):
        p = tmp_path / f"m{s}.npz"
        save_params_npz(p, spec.init(jax.random.PRNGKey(s)))
        paths.append(p.name)
    manifest = tmp_path / "ens_manifest.json"
    manifest.write_text(json.dumps({
        "model": "logcov",
        "members": paths,
        "config": {"model_kw": {"bands": [[3.0, 10.0], [10.0, 48.0]]}},
    }))
    ens = EnsembleEngine.from_manifest(str(manifest))
    probs = ens.predict_batch(dataset.windows[:2])
    assert probs.shape == (2, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)

    # without the model_kw the default 4-band config mismatches the params
    bad = tmp_path / "bad_manifest.json"
    bad.write_text(json.dumps({"model": "logcov", "members": paths}))
    with pytest.raises(Exception):
        EnsembleEngine.from_manifest(str(bad)).predict_batch(
            dataset.windows[:2]
        )


@pytest.fixture(scope="module")
def logcov_member_paths(tmp_path_factory):
    """Whitened logcov seed-ensemble members: different head inits, ONE
    deterministically fitted whitener (the seed-ensemble recipe)."""
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.io import load_trials

    tmp = tmp_path_factory.mktemp("logcov_ens")
    spec = get_model("logcov8", whiten=True, dropout=0.0)
    x_fit = jnp.asarray(load_trials().windows[:48])
    paths = []
    for s in range(3):
        params = spec.fit(spec.init(jax.random.PRNGKey(s)), x_fit)
        p = tmp / f"member{s}.npz"
        save_params_npz(p, params)
        paths.append(str(p))
    return paths


def test_shared_featurization_matches_per_member(logcov_member_paths, dataset):
    """share_features='auto' detects the identical whitener buffers and
    extracts features once; probabilities and guard flags must equal the
    per-member pipeline's."""
    kw = dict(model="logcov8", model_kw={"whiten": True, "dropout": 0.0})
    shared = EnsembleEngine(logcov_member_paths, **kw)
    per_member = EnsembleEngine(
        logcov_member_paths, share_features="never", **kw
    )
    assert shared._shared_featurize
    assert not per_member._shared_featurize

    x = np.array(dataset.windows[50:58], np.float32)
    x[1, :, 2] *= 1e6  # guard-firing fault: flags must survive the share
    p_shared = shared.predict_batch(x)
    p_member = per_member.predict_batch(x)
    np.testing.assert_allclose(p_shared, p_member, atol=1e-6)
    assert shared.stats["guard_flagged"] == per_member.stats["guard_flagged"]
    assert shared.stats["guard_flagged"] >= 1


@pytest.fixture(scope="module")
def mixed_members(tmp_path_factory):
    """Two whitened logcov8 members + two whitened logcov12 members — the
    band-diversity mix cross-validated in tools/crossval.py."""
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.io import load_trials

    tmp = tmp_path_factory.mktemp("mixed_ens")
    x_fit = jnp.asarray(load_trials().windows[:48])
    paths, families = [], []
    for fam in ("logcov8", "logcov12"):
        spec = get_model(fam, whiten=True, dropout=0.0)
        for s in range(2):
            params = spec.fit(spec.init(jax.random.PRNGKey(s)), x_fit)
            p = tmp / f"{fam}_s{s}.npz"
            save_params_npz(p, params)
            paths.append(str(p))
            families.append(fam)
    return paths, families


MIX_KW = {
    "logcov8:whiten": True, "logcov8:dropout": 0.0,
    "logcov12:whiten": True, "logcov12:dropout": 0.0,
}


def test_mixed_family_ensemble_is_mean_over_all_members(mixed_members, dataset):
    """A "famA+famB" engine averages softmax over every member of every
    family, and guard flags OR across families."""
    paths, _families = mixed_members
    ens = EnsembleEngine(paths, model="logcov8+logcov12", model_kw=MIX_KW)
    assert ens.num_members == 4
    # per-group shared featurization: both groups have identical whiteners
    assert ens._shared_featurize == (True, True)

    x = np.array(dataset.windows[50:58], np.float32)
    x[1, :, 2] *= 1e6  # guard-firing fault: flags must survive the mix
    probs = ens.predict_batch(x)

    sub8 = EnsembleEngine(
        paths[:2], model="logcov8", model_kw={"whiten": True, "dropout": 0.0}
    )
    sub12 = EnsembleEngine(
        paths[2:], model="logcov12", model_kw={"whiten": True, "dropout": 0.0}
    )
    expected = (sub8.predict_batch(x) + sub12.predict_batch(x)) / 2
    np.testing.assert_allclose(probs, expected, atol=1e-6)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-5)
    assert ens.stats["guard_flagged"] >= 1


def test_mixed_family_explicit_families_matches_inferred(mixed_members, dataset):
    paths, families = mixed_members
    inferred = EnsembleEngine(paths, model="logcov8+logcov12", model_kw=MIX_KW)
    explicit = EnsembleEngine(
        paths, model="logcov8+logcov12", model_kw=MIX_KW, families=families
    )
    # 8 windows on purpose: shares the bucket-8 pipeline compile with the
    # other mixed-family tests (cold-cache suite time, CLAUDE.md dev loop)
    w = dataset.windows[:8]
    np.testing.assert_allclose(
        inferred.predict_batch(w), explicit.predict_batch(w), atol=1e-6
    )


def test_mixed_family_manifest_roundtrip(mixed_members, dataset, tmp_path):
    import json
    from pathlib import Path

    paths, families = mixed_members
    for p in paths:
        (tmp_path / Path(p).name).write_bytes(Path(p).read_bytes())
    manifest = tmp_path / "mix_manifest.json"
    manifest.write_text(json.dumps({
        "model": "logcov8+logcov12",
        "members": [Path(p).name for p in paths],
        "families": families,
        "config": {"model_kw": MIX_KW},
    }))
    ens = EnsembleEngine.from_manifest(str(manifest))
    direct = EnsembleEngine(paths, model="logcov8+logcov12", model_kw=MIX_KW)
    # bucket-8 slice: reuses the pipeline compiled by the mean test
    w = dataset.windows[:8]
    np.testing.assert_allclose(
        ens.predict_batch(w), direct.predict_batch(w), atol=1e-6
    )


def test_mixed_family_validation(mixed_members):
    paths, _ = mixed_members
    with pytest.raises(ValueError):  # 3 members over 2 families
        EnsembleEngine(paths[:3], model="logcov8+logcov12", model_kw=MIX_KW)
    with pytest.raises(ValueError):  # class-count disagreement
        EnsembleEngine(
            params_list=[
                get_model("logcov8").init(jax.random.PRNGKey(0)),
                get_model("logcov8_5").init(jax.random.PRNGKey(1)),
            ],
            model="logcov8+logcov8_5",
        )
    with pytest.raises(ValueError):  # turbo unsupported on mixes
        EnsembleEngine(
            paths, model="logcov8+logcov12", model_kw=MIX_KW, turbo=True
        )


def test_shared_featurization_requires_identical_whiteners(
    logcov_member_paths, tmp_path, dataset
):
    """A member with a DIFFERENT whitener must disable sharing."""
    import jax.numpy as jnp

    from neural_speech_decoding_tpu.io import load_trials
    from neural_speech_decoding_tpu.io.params_io import load_params_npz

    spec = get_model("logcov8", whiten=True, dropout=0.0)
    other = spec.fit(
        spec.init(jax.random.PRNGKey(9)),
        jnp.asarray(load_trials().windows[60:108]),
    )
    p = tmp_path / "other.npz"
    save_params_npz(p, other)
    paths = list(logcov_member_paths[:2]) + [str(p)]
    ens = EnsembleEngine(
        paths, model="logcov8", model_kw={"whiten": True, "dropout": 0.0}
    )
    assert not ens._shared_featurize
    probs = ens.predict_batch(dataset.windows[:4])
    assert probs.shape == (4, 3)


def test_median_combine_matches_aggregator_replay(member_paths, dataset):
    """combine='median' equals the renormalized per-class median of the
    member probabilities — the exact combiner tools/aggregator_study.py
    measured (+1.3 session on the 3-class deployment, 6/6 fold seeds)."""
    from tools.aggregator_study import aggregate

    windows = dataset.windows[:4]
    med = EnsembleEngine(member_paths, model="tcn_small", combine="median")
    member_probs = np.stack(
        [
            InferenceEngine(p, model="tcn_small").predict_batch(windows)
            for p in member_paths
        ]
    )
    np.testing.assert_allclose(
        med.predict_batch(windows),
        aggregate(member_probs, "median"),
        atol=1e-6,
    )
    with pytest.raises(ValueError):
        EnsembleEngine(member_paths, model="tcn_small", combine="mode")


def test_median_combine_mixed_family(mixed_members, dataset):
    """The mixed-family pipeline medians over ALL members of all groups
    (and keeps guard flags), matching the per-member numpy replay."""
    from tools.aggregator_study import aggregate

    paths, families = mixed_members
    # bucket-8 slice: the member InferenceEngines and the median pipeline
    # then share batch geometry with the rest of the mixed-family tests
    windows = dataset.windows[:8]
    med = EnsembleEngine(
        paths, model="logcov8+logcov12", model_kw=MIX_KW, combine="median"
    )
    out = med.predict_batch(windows)
    member_probs = []
    for p, fam in zip(paths, families):
        eng = InferenceEngine(
            p, model=fam, model_kw={"whiten": True, "dropout": 0.0}
        )
        member_probs.append(eng.predict_batch(windows))
    np.testing.assert_allclose(
        out, aggregate(np.stack(member_probs), "median"), atol=1e-6
    )
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-5)
