import os

# Tests run on CPU (the TPU is reserved for bench runs).  A pytest plugin in
# this environment imports jax before conftest executes, so the JAX_PLATFORMS
# env var alone is too late — use jax.config, which takes effect as long as
# no backend has been initialised yet.
#
# NOTE: this machine has a single CPU core, so we deliberately do NOT force a
# multi-device host platform here — oversubscribed XLA device threads slow
# compilation ~100x.  Multi-chip sharding tests spawn subprocesses that set
# --xla_force_host_platform_device_count themselves.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cpu_subprocess(code: str, n_devices: int, timeout: int = 600) -> str:
    """Run ``code`` in a CPU-only child exposing ``n_devices`` virtual devices.

    The single home of the subprocess env-hygiene rules (CLAUDE.md): the
    host device count must be set before JAX backend init, and the axon
    sitecustomize dials the TPU relay whenever PALLAS_AXON_POOL_IPS is set,
    so it is scrubbed.  Asserts rc==0 and returns the child's stdout.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout
