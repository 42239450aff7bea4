"""Mesh/sharding tests on the 8-device virtual CPU platform."""

import jax
import numpy as np
import pytest

from neural_speech_decoding_tpu.config import DecoderConfig, FilterConfig
from neural_speech_decoding_tpu.models.lstm import decoder_apply, init_decoder_params
from neural_speech_decoding_tpu.ops.kuramoto import mai_filter
from neural_speech_decoding_tpu.parallel.mesh import make_mesh, mesh_axes
from neural_speech_decoding_tpu.parallel.sharding import (
    batch_sharding,
    shard_params_tp,
    sharded_predict_fn,
)


def test_mesh_axes():
    assert mesh_axes(8) == (4, 2)
    assert mesh_axes(1) == (1, 1)
    assert mesh_axes(8, tp=4) == (2, 4)
    with pytest.raises(ValueError):
        mesh_axes(6, tp=4)


def test_requires_8_devices():
    assert len(jax.devices()) == 8


def test_dp_sharded_predict_matches_single_device(checkpoint_path):
    from neural_speech_decoding_tpu.io.checkpoint import load_decoder_params

    params = load_decoder_params(checkpoint_path)
    mesh = make_mesh(tp=1)
    filter_cfg = FilterConfig(precision="fast")
    decoder_cfg = DecoderConfig()

    def pipeline(p, w):
        filtered = jax.vmap(lambda x: mai_filter(x, filter_cfg))(w)
        return jax.nn.softmax(decoder_apply(p, filtered, decoder_cfg), axis=-1)

    rng = np.random.default_rng(0)
    windows = rng.standard_normal((16, 625, 8)).astype(np.float32)

    fn, placed = sharded_predict_fn(mesh, pipeline, params)
    sharded_out = np.asarray(fn(placed, jax.device_put(windows, batch_sharding(mesh))))
    single_out = np.asarray(jax.jit(pipeline)(params, windows))
    np.testing.assert_allclose(sharded_out, single_out, rtol=2e-4, atol=2e-5)


def test_tp_sharded_forward_matches_replicated():
    cfg = DecoderConfig()
    params = init_decoder_params(jax.random.PRNGKey(0), cfg)
    mesh = make_mesh(tp=2)

    x = np.random.default_rng(1).standard_normal((8, 64, 8)).astype(np.float32)

    ref = np.asarray(decoder_apply(params, x, cfg))

    placed = shard_params_tp(mesh, params)
    fn = jax.jit(lambda p, w: decoder_apply(p, w, cfg))
    out = np.asarray(fn(placed, jax.device_put(x, batch_sharding(mesh))))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    # gate matrices really are sharded over tp
    w_ih = placed["lstm"][0]["w_ih"]
    assert "tp" in str(w_ih.sharding.spec)


@pytest.mark.slow
@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip_entry(n):
    import __graft_entry__

    __graft_entry__.dryrun_multichip(n)


def test_graft_entry_forward():
    import __graft_entry__

    fn, (params, windows) = __graft_entry__.entry()
    probs = np.asarray(jax.jit(fn)(params, windows))
    assert probs.shape == (8, 3)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_dp_sharded_logcov_flagship_matches_single_device(dataset):
    """The accuracy flagship (whitened logcov8, polynomial logm + spectrum
    guard) decodes dp-sharded over the virtual mesh identically to a
    single device — the deployment family's multi-chip evidence."""
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch

    fcfg = FilterConfig(precision="fast")
    spec = get_model("logcov8", whiten=True, logm="chebyshev_scan")
    filtered = np.asarray(mai_filter_batch(dataset.windows[:48], fcfg))
    params = spec.fit(spec.init(jax.random.PRNGKey(0)), filtered[:32])
    mesh = make_mesh(tp=1)

    def pipeline(p, w):
        f = jax.vmap(lambda x: mai_filter(x, fcfg))(w)
        return jax.nn.softmax(spec.apply(p, f, train=False), axis=-1)

    windows = np.asarray(dataset.windows[:16], np.float32)
    fn, placed = sharded_predict_fn(mesh, pipeline, params)
    sharded = np.asarray(fn(placed, jax.device_put(windows, batch_sharding(mesh))))
    single = np.asarray(jax.jit(pipeline)(params, windows))
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-5)


def test_dp_sharded_lru_chunked_matches_single_device(dataset):
    """The LRU family's chunked state engine (constant-transition causal
    kernel matmuls, one carry per chunk boundary) decodes dp-sharded over
    the virtual mesh identically to a single device. Batch sharding must
    not interact with the per-chunk carry, which is purely intra-example."""
    from neural_speech_decoding_tpu.models.registry import get_model

    spec = get_model("lru", hidden=16, scan_impl="chunked")
    windows = np.asarray(dataset.windows[:16], np.float32)
    params = spec.init(jax.random.PRNGKey(0))
    mesh = make_mesh(tp=1)

    def pipeline(p, w):
        return jax.nn.softmax(spec.apply(p, w, train=False), axis=-1)

    fn, placed = sharded_predict_fn(mesh, pipeline, params)
    sharded = np.asarray(fn(placed, jax.device_put(windows, batch_sharding(mesh))))
    single = np.asarray(jax.jit(pipeline)(params, windows))
    np.testing.assert_allclose(sharded, single, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_mesh_sharded_ensemble_matches_single_device(dataset):
    """EnsembleEngine with a mesh: (a) dp-over-batch with the member axis
    replicated, and (b) members sharded over 'tp' AND batch over 'dp' —
    both must reproduce the unsharded engine's probabilities and guard
    flags. This is the deployment ensemble's multi-device serving
    evidence (VERDICT r3 #7)."""
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    fcfg = FilterConfig(precision="fast")
    spec = get_model("logcov8", whiten=True, logm="chebyshev_scan")
    filtered = np.asarray(mai_filter_batch(dataset.windows[:32], fcfg))
    members = []
    for seed in range(4):
        p = spec.fit(spec.init(jax.random.PRNGKey(seed)), filtered)
        members.append(p)

    kw = dict(
        model="logcov8",
        model_kw={"whiten": True, "logm": "chebyshev_scan"},
    )
    base = EnsembleEngine(params_list=members, **kw)
    windows = np.asarray(dataset.windows[32:46], np.float32)  # odd batch
    ref = base.predict_batch(windows)

    mesh = make_mesh(tp=1)
    dp_only = EnsembleEngine(params_list=members, mesh=mesh, **kw)
    np.testing.assert_allclose(
        dp_only.predict_batch(windows), ref, rtol=2e-4, atol=2e-5
    )

    mesh2 = make_mesh(tp=2)
    both = EnsembleEngine(
        params_list=members, mesh=mesh2, shard_members=True, **kw
    )
    # the member axis really is sharded over tp
    leaf = jax.tree_util.tree_leaves(both.params)[0]
    assert "tp" in str(leaf.sharding.spec)
    np.testing.assert_allclose(
        both.predict_batch(windows), ref, rtol=2e-4, atol=2e-5
    )
    # guard stats flow through the sharded path too
    assert both.stats["windows"] == windows.shape[0]

    # num_members not divisible by tp is a loud error, not silent padding
    with pytest.raises(ValueError):
        EnsembleEngine(
            params_list=members[:3], mesh=mesh2, shard_members=True, **kw
        )


def test_mesh_sharded_mixed_family_ensemble(dataset):
    """A cross-family mix (logcov8+logcov12) serves dp-sharded over the
    virtual mesh with unchanged probabilities — the multi-device evidence
    for the mixed-band deployment path."""
    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.ops.kuramoto import mai_filter_batch
    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    fcfg = FilterConfig(precision="fast")
    filtered = np.asarray(mai_filter_batch(dataset.windows[:32], fcfg))
    members, families = [], []
    for fam in ("logcov8", "logcov12"):
        spec = get_model(fam, whiten=True, logm="chebyshev_scan")
        for seed in range(2):
            members.append(
                spec.fit(spec.init(jax.random.PRNGKey(seed)), filtered)
            )
            families.append(fam)

    kw = dict(
        model="logcov8+logcov12",
        model_kw={
            "logcov8:whiten": True, "logcov8:logm": "chebyshev_scan",
            "logcov12:whiten": True, "logcov12:logm": "chebyshev_scan",
        },
        families=families,
    )
    base = EnsembleEngine(params_list=members, **kw)
    windows = np.asarray(dataset.windows[32:46], np.float32)  # odd batch
    ref = base.predict_batch(windows)

    mesh = make_mesh(tp=1)
    dp = EnsembleEngine(params_list=members, mesh=mesh, **kw)
    np.testing.assert_allclose(
        dp.predict_batch(windows), ref, rtol=2e-4, atol=2e-5
    )
    assert dp.stats["windows"] == windows.shape[0]


@pytest.mark.slow
def test_mesh_sharded_deployed_manifest(dataset):
    """The shipped 5-member deployment manifest serves dp-sharded over the
    virtual mesh with unchanged probabilities."""
    from pathlib import Path

    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    manifest = (
        Path(__file__).resolve().parents[1]
        / "checkpoints"
        / "logcov8wd_ens_manifest.json"
    )
    if not manifest.is_file():
        pytest.skip("deployment manifest not in this checkout")
    ref_engine = EnsembleEngine.from_manifest(str(manifest))
    sharded = EnsembleEngine.from_manifest(str(manifest), mesh=make_mesh(tp=1))
    windows = np.asarray(dataset.windows[:8], np.float32)
    np.testing.assert_allclose(
        sharded.predict_batch(windows),
        ref_engine.predict_batch(windows),
        rtol=2e-4,
        atol=2e-5,
    )


@pytest.mark.slow
def test_dp_sharded_logcov_train_step_matches_single_device(dataset):
    """One whitened-logcov8 training step, dp-sharded vs single-device:
    same loss, same updated params (the guard's Cholesky and the Clenshaw
    scan both partition over batch with no cross-shard math until the
    psum GSPMD inserts for the loss mean)."""
    import optax

    from neural_speech_decoding_tpu.models.registry import get_model
    from neural_speech_decoding_tpu.parallel.sharding import replicate
    from neural_speech_decoding_tpu.train.loop import make_train_step

    spec = get_model("logcov8", whiten=True, logm="chebyshev_scan")
    x = np.asarray(dataset.windows[:16], np.float32)
    y = np.asarray(dataset.labels[:16], np.int32)
    params = spec.fit(spec.init(jax.random.PRNGKey(0)), x)
    opt = optax.adam(1e-3)
    step = make_train_step(spec, opt, label_smoothing=0.1)
    rng = jax.random.PRNGKey(7)

    ref_params, _, ref_metrics = jax.jit(step)(
        params, opt.init(params), x, y, rng
    )

    mesh = make_mesh(tp=1)
    placed = replicate(mesh, params)
    sh_step = jax.jit(step, in_shardings=(None, None, batch_sharding(mesh),
                                          batch_sharding(mesh, ndim=1), None))
    sh_params, _, sh_metrics = sh_step(
        placed, opt.init(placed), jax.device_put(x, batch_sharding(mesh)),
        jax.device_put(y, batch_sharding(mesh, ndim=1)), rng,
    )
    np.testing.assert_allclose(
        float(sh_metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref_params),
                    jax.tree_util.tree_leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_mesh_sharded_inference_engine(checkpoint_path):
    """InferenceEngine with a mesh: dp-sharded decode equals the
    single-device engine (both LSTM .pth and the batch-padding path)."""
    from neural_speech_decoding_tpu.runtime.engine import InferenceEngine

    base = InferenceEngine(str(checkpoint_path))
    sharded = InferenceEngine(str(checkpoint_path), mesh=make_mesh(tp=1))
    rng = np.random.default_rng(5)
    windows = rng.standard_normal((11, 625, 8)).astype(np.float32)  # odd B
    np.testing.assert_allclose(
        sharded.predict_batch(windows), base.predict_batch(windows),
        rtol=2e-4, atol=2e-5,
    )
