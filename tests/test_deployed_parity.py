"""Decode parity of the SHIPPED deployment checkpoints across the
spectral-path default flip (fft -> matmul, models/logcov.py:64).

The fused matmul front-end routes every deployed whitened checkpoint
through brand-new code by default; this pins the equivalence claim to the
artifacts actually served (not just synthetic fixtures): for each
deployment manifest, both spectral paths must agree in argmax on ALL
golden trials, with small probability deltas. Evidence recorded in
docs/PARITY.md.
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # integration-grade; full suite only

REPO_ROOT = Path(__file__).resolve().parents[1]

# (manifest, prob-delta bound). Measured deltas (also in docs/PARITY.md):
# 1.1e-6 / 6.0e-7 for the 3-class manifests, 2.2e-3 for the 5-class one
# (its guard clamps sit closer to the domain edge); argmax parity is exact
# for all three.
MANIFESTS = [
    ("checkpoints/logcov8w_deploy_manifest.json", 1e-3),
    ("checkpoints/logcov8wd_ens_manifest.json", 1e-3),
    ("checkpoints/logcov8_5_wd_ens_manifest.json", 1e-2),
]


def _ensemble_probs(manifest_path: Path, x, spectral: str) -> np.ndarray:
    from neural_speech_decoding_tpu.io.params_io import load_params_npz
    from neural_speech_decoding_tpu.models.registry import get_model

    manifest = json.loads(manifest_path.read_text())
    kw = dict(manifest["config"].get("model_kw") or {})
    kw["spectral"] = spectral
    spec = get_model(manifest["model"], **kw)
    probs = []
    for member in manifest["members"]:
        params = load_params_npz(REPO_ROOT / member)
        logits = jax.jit(lambda p, w: spec.apply(p, w, train=False))(params, x)
        probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
    return np.mean(probs, axis=0)


@pytest.fixture(scope="module")
def filtered_trials() -> np.ndarray:
    path = REPO_ROOT / "tests" / "golden" / "reference_filtered.npz"
    if not path.is_file():
        pytest.skip("golden filtered fixture missing — run tools/make_golden.py")
    with np.load(path, allow_pickle=False) as z:
        return np.asarray(z["filtered"], np.float32)


@pytest.mark.parametrize("manifest,bound", MANIFESTS)
def test_shipped_checkpoint_logm_parity(manifest, bound, filtered_trials):
    """logm defaulted to 'chebyshev' until round 4; the default is now
    'rational' (the resolvent sum — ~3x faster fused kernel AND ~4x more
    accurate vs f64 eigh). Pin the flip to the shipped artifacts: both
    backends must agree in argmax on ALL golden trials, with bounded
    prob deltas. (On-chip fused-kernel parity measured 2026-08-18:
    argmax exact on all 179 trials for all three manifests, max dprob
    2.5e-4 / 8.1e-5 / 1.6e-4.)"""
    from neural_speech_decoding_tpu.io.params_io import load_params_npz
    from neural_speech_decoding_tpu.models.registry import get_model

    mpath = REPO_ROOT / manifest
    if not mpath.is_file():
        pytest.skip(f"{manifest} not present")
    x = jnp.asarray(filtered_trials)
    man = json.loads(mpath.read_text())
    kw = dict(man["config"].get("model_kw") or {})
    probs = {}
    for logm in ("rational", "chebyshev"):
        spec = get_model(man["model"], **{**kw, "logm": logm})
        member_probs = []
        for member in man["members"]:
            params = load_params_npz(REPO_ROOT / member)
            logits = jax.jit(lambda p, w: spec.apply(p, w, train=False))(
                params, x
            )
            member_probs.append(np.asarray(jax.nn.softmax(logits, axis=-1)))
        probs[logm] = np.mean(member_probs, axis=0)
    np.testing.assert_array_equal(
        probs["rational"].argmax(1), probs["chebyshev"].argmax(1)
    )
    assert float(np.abs(probs["rational"] - probs["chebyshev"]).max()) < bound


@pytest.mark.parametrize("manifest,bound", MANIFESTS)
def test_shipped_checkpoint_filter_precision_parity(manifest, bound):
    """The serving engines default to the FAST filter (round 4): in f32 the
    precision modes differ only in the 8x8 ridge solve (GJ+Newton-Schulz vs
    LU), and on TPU the LU path costs 2.3x the filter. Pin the flip to the
    shipped artifacts end-to-end: raw golden trials through EnsembleEngine
    under both filter configs must agree in argmax on every trial."""
    import dataclasses

    from neural_speech_decoding_tpu.config import FilterConfig
    from neural_speech_decoding_tpu.io.dataset import load_trials
    from neural_speech_decoding_tpu.runtime.ensemble import EnsembleEngine

    mpath = REPO_ROOT / manifest
    if not mpath.is_file():
        pytest.skip(f"{manifest} not present")
    raw = jnp.asarray(load_trials().windows)

    eng_fast = EnsembleEngine.from_manifest(str(mpath))
    assert eng_fast.config.filter.precision == "fast"  # the round-4 default
    eng_hi = EnsembleEngine.from_manifest(
        str(mpath),
        config=dataclasses.replace(
            eng_fast.config, filter=FilterConfig(precision="highest")
        ),
    )

    def probs_of(eng):
        out = eng._pipeline(eng.params, raw)
        return np.asarray(out[0] if eng._has_aux else out)

    p_fast, p_hi = probs_of(eng_fast), probs_of(eng_hi)
    np.testing.assert_array_equal(p_fast.argmax(1), p_hi.argmax(1))
    assert float(np.abs(p_fast - p_hi).max()) < bound


@pytest.mark.parametrize("manifest,bound", MANIFESTS)
def test_shipped_checkpoint_spectral_parity(manifest, bound, filtered_trials):
    mpath = REPO_ROOT / manifest
    if not mpath.is_file():
        pytest.skip(f"{manifest} not present")
    x = jnp.asarray(filtered_trials)

    p_fft = _ensemble_probs(mpath, x, "fft")
    p_mm = _ensemble_probs(mpath, x, "matmul")

    # the deployment claim: exact argmax parity on every shipped trial
    np.testing.assert_array_equal(p_fft.argmax(1), p_mm.argmax(1))
    # and the probabilities themselves barely move (bounds sit well above
    # the measured deltas in the MANIFESTS comment)
    assert float(np.abs(p_fft - p_mm).max()) < bound
