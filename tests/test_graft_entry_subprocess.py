"""Driver-shaped smoke tests for __graft_entry__.

The driver invokes `dryrun_multichip(n)` in a FRESH interpreter where
sitecustomize has preloaded jax with JAX_PLATFORMS pointing at the
single-chip TPU tunnel ("axon") — NOT under conftest's pre-configured CPU
platform. Round-1 failed exactly here (MULTICHIP_r01.json rc=1, "need 8
devices, have 1") because jax.devices() ran before the CPU-fallback config
updates. These tests reproduce the driver environment: a subprocess with
JAX_PLATFORMS / XLA_FLAGS stripped so sitecustomize's axon default applies.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


def _driver_env() -> dict:
    """Environment as the driver provides it: no CPU override from us."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)
    return env


def _run(code: str, timeout: float = 600.0) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO_ROOT,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.mark.slow
def test_dryrun_multichip_8_fresh_interpreter():
    proc = _run(
        "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
    )
    assert proc.returncode == 0, (
        f"driver-shaped dryrun failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip ok" in proc.stdout


@pytest.mark.slow
def test_entry_compiles_fresh_interpreter():
    # entry() must compile on whatever single device the driver has; force
    # CPU via jax.config (NOT env — sitecustomize wins over env) the same
    # way dryrun does, so this test never touches the real chip.
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from __graft_entry__ import entry\n"
        "import numpy as np\n"
        "fn, (params, windows) = entry()\n"
        "probs = np.asarray(jax.jit(fn)(params, windows))\n"
        "assert probs.shape == (8, 3), probs.shape\n"
        "assert np.allclose(probs.sum(-1), 1.0, atol=1e-4)\n"
        "print('entry ok')\n"
    )
    proc = _run(code)
    assert proc.returncode == 0, (
        f"entry compile-check failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "entry ok" in proc.stdout
