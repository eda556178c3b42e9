"""CLI smoke: the benchmark driver's reference grammar end-to-end."""
import json
import pytest
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def test_benchmark_cli_simulate(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "benchmarks/benchmark.py",
         "-p", "2", "-q", "4", "bv", "5", "1",
         # 20000 shots (the reference runtime's default, qvm/run.py:24)
         # keeps the shot-sampled knit's Hellinger above the 0.99 bar;
         # at the CLI default 1000 the S=8 wire-cut variance lands ~0.97
         "--simulate", "--shots", "20000", "--results-dir", str(tmp_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout + proc.stderr
    assert "cutVsUncutFidelity" in out
    # the run directory carries the cut-plan + metrics artifacts
    runs = list(tmp_path.iterdir())
    assert runs, "no artifact directory created"
    names = {p.name for p in runs[0].iterdir()}
    assert "cut_plan.json" in names, names
    m = json.loads((runs[0] / "metrics.json").read_text())
    assert m["cutVsUncutFidelity"] > 0.99, m


@pytest.mark.parametrize(
    "script", ["simple.py", "wire_cut.py", "fid.py", "qasm_migration.py",
               "variational.py", "vqe.py", "qaoa.py", "population.py",
               "gamma_sampled.py"]
)
def test_examples_run(script):
    """Every (fast) example must run end-to-end — stale examples are a
    reference failure mode we test against (SURVEY §7.5)."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, str(REPO / "examples" / script)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
