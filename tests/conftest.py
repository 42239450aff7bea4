"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding is validated on
a host-platform mesh; real TPU runs happen in bench.py) and with x64 enabled
so the float64 fidelity path matches the reference numerics natively.
Environment must be set before jax is first imported.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU tunnel ("axon"),
# but tests run on the virtual 8-device host platform (override with
# NSD_TEST_PLATFORM to exercise real hardware). jax may already be imported
# by a pytest plugin, so config.update (not env vars) is the reliable path.
_platform = os.environ.get("NSD_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
if _platform == "cpu":
    jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite's wall-clock is dominated by
# repeated jit compiles (8-virtual-device SPMD programs recompile per
# process). The cache cuts warm reruns substantially; it is keyed on
# program + flags, so correctness is unaffected. Opt out with
# NSD_TEST_NO_COMPILE_CACHE=1 (e.g. when bisecting compiler issues).
if not os.environ.get("NSD_TEST_NO_COMPILE_CACHE"):
    _cache_dir = os.environ.get(
        "NSD_TEST_COMPILE_CACHE_DIR", "/tmp/nsd_jax_test_cache"
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REPO_ROOT = Path(__file__).resolve().parents[1]
REFERENCE_DATA = Path("/root/reference/EEG_data_collection")
REFERENCE_CKPT = Path(
    "/root/reference/Neuro-Alpha-App/Utilities/LSTM_Model/"
    "lstm_classifier_Water_Food_Bg_Noise.pth"
)
GOLDEN_DIR = REPO_ROOT / "tests" / "golden"


@pytest.fixture(scope="session")
def data_dir() -> Path:
    if not REFERENCE_DATA.is_dir():
        pytest.skip("reference EEG_data_collection not mounted")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def checkpoint_path() -> Path:
    if not REFERENCE_CKPT.is_file():
        pytest.skip("reference checkpoint not mounted")
    return REFERENCE_CKPT


@pytest.fixture(scope="session")
def golden(checkpoint_path) -> dict:
    """Reference torch probabilities/logits for all trials (generated once
    by tools/make_golden.py and committed to tests/golden/)."""
    path = GOLDEN_DIR / "reference_probs.npz"
    if not path.is_file():
        pytest.skip("golden file missing — run tools/make_golden.py")
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def dataset(data_dir):
    """The 179 production trials (3-class prefixes) — what the shipped
    checkpoint was trained on; training/CV tests use this."""
    from neural_speech_decoding_tpu.io.dataset import load_trials

    return load_trials(data_dir)


@pytest.fixture(scope="session")
def dataset_all(data_dir):
    """All 324 shipped trials (5-class prefixes) — the BASELINE.md
    fidelity universe; the golden fixtures are generated over this set
    (fidelity is label-free, so yes/no trials count as test vectors)."""
    from neural_speech_decoding_tpu.config import FIVE_CLASS_PREFIXES
    from neural_speech_decoding_tpu.io.dataset import load_trials

    return load_trials(data_dir, class_prefixes=FIVE_CLASS_PREFIXES)


def golden_rows(golden: dict, files) -> "np.ndarray":
    """Row indices of `files` inside a golden dump (the golden fixtures
    cover all 324 trials; tests pairing them with the 179-trial `dataset`
    must match by filename, not by position)."""
    index = {f: i for i, f in enumerate(golden["files"])}
    return np.asarray([index[f] for f in files])
