"""Multi-chip sharding tests.

These run in subprocesses because the host platform device count must be set
before JAX backend initialisation (and this 1-core machine slows to a crawl
if the whole pytest process forces many XLA host devices)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_in_subprocess(code: str, n_devices: int) -> str:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # keep the axon TPU plugin out of the child: its sitecustomize (on the
    # parent PYTHONPATH) registers the axon backend whenever
    # PALLAS_AXON_POOL_IPS is set
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


@pytest.mark.slow
def test_dryrun_multichip_2dev():
    out = _run_in_subprocess(
        "from __graft_entry__ import dryrun_multichip;"
        "dryrun_multichip(2)",
        2,
    )
    assert "dryrun_multichip OK" in out


@pytest.mark.slow
def test_entry_compiles():
    out = _run_in_subprocess(
        "import jax; from __graft_entry__ import entry;"
        "fn, args = entry();"
        "print('shape', jax.jit(fn)(*args).shape)",
        1,
    )
    assert "shape" in out
