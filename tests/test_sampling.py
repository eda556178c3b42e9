"""Device-side Smolin projection + inverse-CDF sampling (shot serving)."""
import jax
import jax.numpy as jnp
import numpy as np

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    smolin_project,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sampling import (
    sample_indices_device,
    smolin_project_traced,
)


def test_device_smolin_matches_host_twin():
    rng = np.random.default_rng(42)
    for size in (17, 256, 1023):
        v = rng.normal(0.05, 0.4, size=size).astype(np.float32)
        v /= np.abs(v).sum()
        host = smolin_project(v.astype(np.float64))
        dev = np.asarray(jax.jit(smolin_project_traced)(jnp.asarray(v)))
        np.testing.assert_allclose(dev, host, atol=5e-6)
        # the projection preserves the input's total mass (shift only
        # redistributes the discarded negative tail)
        assert abs(dev.sum() - host.sum()) < 1e-5


def test_device_smolin_nonnegative_input_identity():
    v = np.array([0.25, 0.25, 0.5, 0.0], np.float32)
    dev = np.asarray(smolin_project_traced(jnp.asarray(v)))
    np.testing.assert_allclose(dev, v, atol=1e-7)


def test_device_smolin_all_negative_degenerate():
    v = np.array([-0.5, -0.25], np.float32)
    dev = np.asarray(smolin_project_traced(jnp.asarray(v)))
    np.testing.assert_allclose(dev, 0.0)


def test_sample_indices_statistics():
    p = np.zeros(128, np.float32)
    p[5], p[77], p[100] = 0.5, 0.3, 0.2
    idx = np.asarray(
        sample_indices_device(jnp.asarray(p), 40000, jax.random.PRNGKey(1))
    )
    counts = np.bincount(idx, minlength=128) / 40000.0
    assert abs(counts[5] - 0.5) < 0.02
    assert abs(counts[77] - 0.3) < 0.02
    assert abs(counts[100] - 0.2) < 0.02
    mask = np.ones(128, bool)
    mask[[5, 77, 100]] = False
    assert counts[mask].sum() == 0.0
