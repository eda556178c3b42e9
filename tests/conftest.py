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
