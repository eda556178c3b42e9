"""Population-batched gradient-free optimisers (ops/optim.py).

The reference has no optimisation story (sampling-only ansatz
generators); these lock the beyond-reference SPSA/NES serving path:
correct estimator mechanics on an analytic bowl, convergence on a real
cut-circuit energy, and (in test_multichip.py) dp-sharded populations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (
    dense_matrix,
    make_hamiltonian_energy,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.optim import (
    nes_minimize,
    population_energy,
    spsa_minimize,
)

TARGET = jnp.asarray([0.7, -0.3, 1.1], jnp.float32)


def bowl(theta):
    d = theta - TARGET
    return jnp.dot(d, d)


def test_population_energy_matches_loop():
    thetas = jnp.asarray(
        np.random.default_rng(0).normal(size=(5, 3)), jnp.float32
    )
    batched = population_energy(bowl)(thetas)
    looped = jnp.stack([bowl(t) for t in thetas])
    np.testing.assert_allclose(batched, looped, rtol=1e-6)


def test_spsa_converges_on_quadratic():
    res = spsa_minimize(
        bowl, jnp.zeros(3), steps=200, key=jax.random.PRNGKey(1),
        pairs=4, a=0.4, c=0.1,
    )
    assert res.energy < 1e-2, (res.energy, res.theta)
    np.testing.assert_allclose(res.theta, TARGET, atol=0.1)
    assert res.evaluations == 2 * 4 * 200 + 1
    assert res.history.shape == (200,)
    # the probe-mean history must trend down (compare first/last quarters)
    assert res.history[-50:].mean() < res.history[:50].mean()


def test_nes_converges_on_quadratic():
    res = nes_minimize(
        bowl, jnp.zeros(3), steps=150, key=jax.random.PRNGKey(2),
        pop=8, sigma=0.2, lr=0.3,
    )
    assert res.energy < 5e-2, (res.energy, res.theta)
    np.testing.assert_allclose(res.theta, TARGET, atol=0.15)
    assert res.evaluations == 8 * 150 + 1


def test_nes_rejects_odd_population():
    with pytest.raises(ValueError):
        nes_minimize(bowl, jnp.zeros(3), steps=1,
                     key=jax.random.PRNGKey(0), pop=5)


def _tfim_setup(n=4):
    """TFIM-n energy on a 2-partition cut ansatz + its exact ground energy."""
    rng = np.random.default_rng(11)
    th0 = rng.uniform(-0.5, 0.5, 2 * n)

    def ansatz():
        c = Circuit(n, n)
        for q in range(n):
            c.ry(ParamRef(q, float(th0[q])), q)
        for i in range(n - 1):
            c.cx(i, i + 1)
        for q in range(n):
            c.ry(ParamRef(n + q, float(th0[n + q])), q)
        return c

    terms = []
    for i in range(n - 1):
        p = ["I"] * n
        p[i] = p[i + 1] = "Z"
        terms.append((-1.0, "".join(p)))
    for i in range(n):
        p = ["I"] * n
        p[i] = "X"
        terms.append((-0.6, "".join(p)))

    kw = dict(maxNPartitions=2, maxNQubitsPerPartition=n // 2 + 1,
              maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    energy, info = make_hamiltonian_energy(ansatz(), kw, terms)
    e0 = float(np.linalg.eigvalsh(dense_matrix(terms, n)).min())
    return energy, info, np.asarray(th0, np.float32), e0


def test_spsa_on_cut_circuit_descends_toward_ground_state():
    energy, info, th0, e0 = _tfim_setup()
    start = float(jax.jit(energy)(jnp.asarray(th0)))
    res = spsa_minimize(
        energy, th0, steps=80, key=jax.random.PRNGKey(3),
        pairs=4, a=0.6, c=0.15,
    )
    # gradient-free + shallow ansatz: demand real progress, not optimality
    assert res.energy < start - 0.5 * (start - e0), (start, res.energy, e0)
    assert res.energy >= e0 - 1e-4  # variational bound: never below ground


def test_nes_on_cut_circuit_descends():
    energy, info, th0, e0 = _tfim_setup()
    start = float(jax.jit(energy)(jnp.asarray(th0)))
    res = nes_minimize(
        energy, th0, steps=60, key=jax.random.PRNGKey(4),
        pop=8, sigma=0.2, lr=0.25,
    )
    assert res.energy < start - 0.3 * (start - e0), (start, res.energy, e0)
    assert res.energy >= e0 - 1e-4
