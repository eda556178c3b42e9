import math

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)


def test_ghz_distribution():
    c = Circuit(3)
    c.h(0)
    c.cx(0, 1)
    c.cx(1, 2)
    c.measure_all()
    d = simulate_circuit(c).to_dict(tol=1e-9)
    assert set(d) == {0, 7}
    assert d[0] == pytest.approx(0.5, abs=1e-6)
    assert d[7] == pytest.approx(0.5, abs=1e-6)


def test_bv_secret():
    # deliberately NOT a palindrome so a bit-order bug in the engine or
    # to_dict flips the result instead of cancelling out
    secret = "110"
    n = len(secret) + 1
    c = Circuit(n, n - 1)
    c.x(n - 1)
    for q in range(n):
        c.h(q)
    for i, bit in enumerate(reversed(secret)):  # bit i of secret on qubit i
        if bit == "1":
            c.cx(i, n - 1)
    for q in range(n - 1):
        c.h(q)
    for q in range(n - 1):
        c.measure(q, q)
    d = simulate_circuit(c).to_dict(tol=1e-6)
    assert set(d) == {int(secret, 2)}
    assert d[int(secret, 2)] == pytest.approx(1.0, abs=1e-5)


def test_mid_circuit_measure_deferred():
    # measure in the middle, then keep using the qubit
    c = Circuit(1, 2)
    c.h(0)
    c.measure(0, 0)
    c.h(0)
    c.measure(0, 1)
    d = simulate_circuit(c).to_dict(tol=1e-9)
    # outcome: first bit uniform; second bit uniform given collapse
    assert d[0b00] == pytest.approx(0.25, abs=1e-6)
    assert d[0b01] == pytest.approx(0.25, abs=1e-6)
    assert d[0b10] == pytest.approx(0.25, abs=1e-6)
    assert d[0b11] == pytest.approx(0.25, abs=1e-6)


def test_reset():
    c = Circuit(2, 2)
    c.x(0)
    c.cx(0, 1)
    c.reset(0)
    c.measure(0, 0)
    c.measure(1, 1)
    d = simulate_circuit(c).to_dict(tol=1e-9)
    assert d == {0b10: pytest.approx(1.0, abs=1e-6)}


def test_rzz_cp_phases_match_matrix_algebra():
    # cp(theta) == diag(1,1,1,e^{i theta}) up to measurement statistics with
    # interference: build an interferometer sensitive to the phase
    theta = 1.234
    c = Circuit(2, 2)
    c.h(0)
    c.x(1)
    c.cp(theta, 0, 1)
    c.h(0)
    c.measure(0, 0)
    c.measure(1, 1)
    d = simulate_circuit(c).to_dict(tol=1e-9)
    p0 = math.cos(theta / 2) ** 2
    assert d[0b10] == pytest.approx(p0, abs=1e-5)
    assert d[0b11] == pytest.approx(1 - p0, abs=1e-5)


def test_depth_and_counts():
    c = Circuit(2)
    c.h(0)
    c.cx(0, 1)
    assert c.depth() == 2
    assert c.count_ops() == {"h": 1, "cx": 1}
    assert c.num_tensor_factors() == 1


def test_host_oracle_matches_device_engine():
    """simulate_circuit_host (numpy, no device program — the 20+ qubit
    oracle path for the tunneled TPU) must agree with simulate_circuit
    bit-for-bit across zoo families, including measure_all layouts."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit_host,
    )

    for name, n, d in [("ghz", 6, 1), ("hwe", 5, 2), ("sup", 9, 1),
                       ("bv", 6, 1), ("aqft", 6, 1), ("add", 6, 1),
                       ("qft", 5, 1)]:
        circ = genCirc(name, n, d)
        dev = simulate_circuit(circ)
        host = simulate_circuit_host(circ)
        assert dev.bit_positions == host.bit_positions, name
        np.testing.assert_allclose(
            np.asarray(dev.values), host.values, atol=1e-6, err_msg=name
        )


def test_masked_slice_apply_matches_einsum():
    """_apply_masked_slices (traced block + host-known union zero mask,
    the fused-slot fast path) must match the general einsum lowering
    bit-for-bit.  The mask is a strict SUPERSET of each block's support,
    exactly like the union-over-variants pattern make_sim_fn computes."""
    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        apply_matrix,
    )

    rng = np.random.default_rng(7)
    n = 5
    for axes in [(2,), (1, 3), (3, 0), (4, 1, 2)]:
        k = len(axes)
        m = 1 << k
        # a few "variants" sharing a sparsity pattern; union mask is a
        # superset of any single variant's support
        support = rng.random((2, m, 2, m)) < 0.5
        variants = np.stack([
            rng.normal(size=(2, m, 2, m)).astype(np.float32) * support
            * (rng.random((2, m, 2, m)) < 0.8)  # per-variant extra zeros
            for _ in range(3)
        ])
        mask = np.any(variants != 0, axis=0)
        block = variants[1]
        state = rng.normal(size=(2, 1 << n)).astype(np.float32)

        masked = jax.jit(
            lambda b, s: apply_matrix(s, b, axes, n, zero_mask=mask)
        )(jnp.asarray(block), jnp.asarray(state))
        plain = jax.jit(
            lambda b, s: apply_matrix(s, b, axes, n)
        )(jnp.asarray(block), jnp.asarray(state))
        np.testing.assert_allclose(
            np.asarray(masked), np.asarray(plain), atol=1e-5,
            err_msg=f"axes={axes}",
        )
