"""Fused Kuramoto filter operator kernel (ops/pallas/kuramoto.py +
ops/kuramoto._mai_filter_batch_fused).

The kernel fuses Hilbert (in-VMEM MXU dot) + transcendental-free c2/s2
+ the 36 pair-desynchrony sums; its outputs must match the XLA stages
path (analytic_signal_matmul -> kuramoto_operator_from_parts) to fp
reordering, and the full fused batch filter must match vmap(mai_filter)
in fast mode — including the degenerate all-zero-channel guard.

Interpreter mode runs the kernel's exact layout logic on CPU; the
on-chip fidelity gate is the golden dlogit sweep (tools/fidelity_report).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neural_speech_decoding_tpu.config import FilterConfig
from neural_speech_decoding_tpu.ops import kuramoto as ku
from neural_speech_decoding_tpu.ops.hilbert import analytic_signal_matmul
from neural_speech_decoding_tpu.ops.pallas.kuramoto import kuramoto_pair_sums

T, C = 625, 8


def _stages_gram(x_btc: np.ndarray) -> np.ndarray:
    """G = T - 2P (off-diag) recovered from the stages operator; the
    diagonal is T exactly for non-degenerate channels."""
    grams = []
    for w in x_btc:
        re, im = analytic_signal_matmul(jnp.asarray(w, jnp.float32))
        p = ku.kuramoto_operator_from_parts(re, im)
        g = float(T) - 2.0 * np.asarray(p)
        grams.append(g)
    return np.stack(grams)


@pytest.mark.slow
def test_pair_sums_interpret_matches_stages():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, T, C)).astype(np.float32)
    got = np.asarray(kuramoto_pair_sums(jnp.asarray(x), interpret=True))
    ref = _stages_gram(x)
    # both paths sum 625 O(1) terms in f32; only the order differs
    np.testing.assert_allclose(got, ref, atol=5e-3)
    assert np.allclose(got, np.swapaxes(got, -1, -2)), "gram not symmetric"


@pytest.mark.slow
def test_pair_sums_degenerate_channel():
    # all-zero channel: np.angle(0) == 0 -> c2 = 1, s2 = 0 (the stages
    # guard); its self-pair sum is exactly T, cross pairs are sum(c2_j)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, T, C)).astype(np.float32)
    x[:, :, 3] = 0.0
    got = np.asarray(kuramoto_pair_sums(jnp.asarray(x), interpret=True))
    ref = _stages_gram(x)
    np.testing.assert_allclose(got, ref, atol=5e-3)
    np.testing.assert_allclose(got[:, 3, 3], float(T), rtol=1e-6)


@pytest.mark.slow
def test_fused_batch_matches_stages_fast_mode():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((7, T, C)) * 40.0, jnp.float32)
    cfg = FilterConfig(precision="fast")
    ref = np.asarray(jax.vmap(lambda w: ku.mai_filter(w, cfg))(x))
    got = np.asarray(ku._mai_filter_batch_fused(x, cfg, interpret=True))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, atol=2e-4 * scale)


@pytest.mark.slow
def test_fused_kernel_sharded_dp_mesh(monkeypatch):
    """The engines' mesh route (shard_map over 'dp',
    mai_filter_batch_sharded) must run the fused kernel per-shard and match
    the stages path — interpret mode pins the composition off-TPU (a Mosaic
    custom call cannot be auto-partitioned by GSPMD; r4 advisor finding)."""
    monkeypatch.setenv("NSD_FUSED_INTERPRET", "1")
    from neural_speech_decoding_tpu.parallel.mesh import make_mesh
    from neural_speech_decoding_tpu.parallel.sharding import batch_sharding

    mesh = make_mesh()
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2 * mesh.shape["dp"], T, C)).astype(np.float32)
    cfg_k = FilterConfig(precision="fast", fused="kernel")
    cfg_s = FilterConfig(precision="fast", fused="stages")
    xd = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
    got = np.asarray(
        jax.jit(lambda w: ku.mai_filter_batch_sharded(w, cfg_k, mesh=mesh))(xd)
    )
    ref = np.asarray(ku.mai_filter_batch(jnp.asarray(x), cfg_s))
    np.testing.assert_allclose(got, ref, atol=2e-4 * np.abs(ref).max())


@pytest.mark.slow
def test_batch_front_door_dispatch(monkeypatch):
    # with the interpret escape hatch set, the front door takes the
    # fused path; fused="stages" must keep the stages path bit-exact
    monkeypatch.setenv("NSD_FUSED_INTERPRET", "1")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((3, T, C)), jnp.float32)
    cfg_k = FilterConfig(precision="fast", fused="kernel")
    cfg_s = FilterConfig(precision="fast", fused="stages")
    stages = np.asarray(jax.vmap(lambda w: ku.mai_filter(w, cfg_s))(x))
    via_door = np.asarray(ku.mai_filter_batch(x, cfg_s))
    # jit fusion may reorder fp ops vs the unjitted vmap — tight, not exact
    np.testing.assert_allclose(
        via_door, stages, atol=1e-5 * np.abs(stages).max()
    )
    fused = np.asarray(ku.mai_filter_batch(x, cfg_k))
    np.testing.assert_allclose(fused, stages, atol=2e-4 * np.abs(stages).max())
