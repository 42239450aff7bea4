"""Driver-contract test for bench.py: one JSON line on stdout.

Runs the real script in a fresh interpreter (tiny batch, CPU platform via
config — env vars are too late under this image's sitecustomize) so a
refactor can't silently break the metric line the driver records.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]


@pytest.mark.slow
@pytest.mark.parametrize(
    "extra",
    [
        [],
        ["--mesh"],
        ["--ensemble", "checkpoints/logcov8_ens_manifest.json"],
    ],
    ids=["default", "mesh", "ensemble"],
)
def test_bench_emits_one_json_line(extra):
    if extra and extra[0] == "--ensemble" and not (
        REPO_ROOT / extra[1]
    ).is_file():
        pytest.skip("no deployment ensemble manifest in this checkout")
    argv = ["bench.py"] + extra
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.argv = {argv!r}\n"
        "import runpy\n"
        "runpy.run_path('bench.py', run_name='__main__')\n"
    )
    env = dict(os.environ)
    env.update(
        NSD_BENCH_BATCH="32",
        NSD_BENCH_ITERS="1",
        NSD_BENCH_CPU_WINDOWS="2",
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(json_lines) == 1, proc.stdout
    payload = json.loads(json_lines[0])
    assert payload["metric"].startswith("eeg_windows_per_sec")
    assert payload["value"] > 0
    assert payload["unit"].startswith("windows/s")
    assert "vs_baseline" in payload
    if not extra:
        # default line carries the fidelity mode and the flagship number
        # (VERDICT r2 #4): the driver record should explain the
        # rational-gates trade and show the repo's best decoder
        assert payload["gate_math"] == "rational"
        # transfer-corrected latency (VERDICT r3 #4): both the raw synced
        # number and the compute-only figure ship in the driver record
        assert payload["batch1_p50_latency_ms"] > 0
        # amortized 64-deep on-device chain: genuinely positive, not the
        # old "p50 - rtt" subtraction that clamps to 0 under tunnel jitter
        assert payload["batch1_compute_p50_ms"] > 0
        assert payload["tunnel_rtt_p50_ms"] >= 0
        # compute is measured by a separate amortized chain, so on a local
        # device (rtt ~0) it can land a hair above the single-call p50 —
        # allow measurement noise, but it must never exceed the client-
        # observed latency by more than that.
        assert payload["batch1_compute_p50_ms"] <= (
            payload["batch1_p50_latency_ms"] * 1.25 + 0.5
        )
        if (REPO_ROOT / "checkpoints" / "logcov8w_deploy_manifest.json").is_file():
            assert payload["flagship_wps"] and payload["flagship_wps"] > 0
        # recommended 5-member deployment ensemble, shared-featurized
        if (REPO_ROOT / "checkpoints" / "logcov8wd_ens_manifest.json").is_file():
            assert payload["deploy_ensemble_wps"] and payload["deploy_ensemble_wps"] > 0
            assert payload["deploy_ensemble_members"] == 5
