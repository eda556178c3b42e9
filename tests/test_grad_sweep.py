"""Differentiable sweep: jax.grad through the cut-sim-knit pipeline.

The reference has no gradient story at all (its variational ansatz
generators qcg/hw_efficient_ansatz.py / uccsd_ansatz.py are
sampling-only); this is a TPU-native extension built on
make_parameter_sweep.
"""
import copy
import pickle

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
    make_differentiable_sweep,
    pauli_z_diagonal,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)

N = 5


def _ansatz(thetas):
    """2-layer ry/rx ansatz over a cx chain; every rotation carries a
    ParamRef so the differentiable binder sees all 2N parameters."""
    c = Circuit(N, N)
    for q in range(N):
        c.ry(ParamRef(q, float(thetas[q])), q)
    for i in range(N - 1):
        c.cx(i, i + 1)
    for q in range(N):
        c.rx(ParamRef(N + q, float(thetas[N + q])), q)
    for q in range(N):
        c.measure(q, q)
    return c


def _cut(circ):
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


THETA0 = np.linspace(0.3, 2.1, 2 * N)


def test_runner_matches_engine_at_template_theta():
    virt = _cut(_ansatz(THETA0))
    runner, n_params = make_differentiable_sweep(virt)
    assert n_params == 2 * N
    vals = np.asarray(runner(jnp.asarray(THETA0, jnp.float32)))
    want, _ = run_virtual_circuit(virt, project=False)
    np.testing.assert_allclose(vals, np.asarray(want.values), atol=3e-6)


def test_runner_matches_engine_at_other_theta_single_compile():
    """New thetas through ONE compiled program must equal a from-scratch
    cut+run at those thetas."""
    virt = _cut(_ansatz(THETA0))
    runner, _ = make_differentiable_sweep(virt)
    jr = jax.jit(runner)
    rng = np.random.default_rng(3)
    for _ in range(2):
        th = rng.uniform(-2, 2, 2 * N)
        vals = np.asarray(jr(jnp.asarray(th, jnp.float32)))
        fresh, _ = run_virtual_circuit(_cut(_ansatz(th)), project=False)
        np.testing.assert_allclose(
            vals, np.asarray(fresh.values), atol=5e-6
        )
    assert jr._cache_size() == 1


def test_grad_matches_finite_differences():
    virt = _cut(_ansatz(THETA0))
    runner, _ = make_differentiable_sweep(virt)
    diag = jnp.asarray(pauli_z_diagonal(sorted(range(N)), set(range(N))))

    def energy(th):
        return jnp.sum(runner(th) * diag)

    g = np.asarray(jax.grad(energy)(jnp.asarray(THETA0, jnp.float32)))
    je = jax.jit(energy)
    eps = 1e-2
    for i in [0, 3, N, 2 * N - 1]:
        tp = THETA0.copy(); tp[i] += eps
        tm = THETA0.copy(); tm[i] -= eps
        fd = (
            float(je(jnp.asarray(tp, jnp.float32)))
            - float(je(jnp.asarray(tm, jnp.float32)))
        ) / (2 * eps)
        assert abs(g[i] - fd) < 5e-4, (i, g[i], fd)


def test_gradient_descent_finds_ground_state():
    """Plain gradient descent on <prod Z> must converge to the exact
    ground state (-1) — the end-to-end variational story on a cut
    circuit."""
    virt = _cut(_ansatz(THETA0))
    runner, _ = make_differentiable_sweep(virt)
    diag = jnp.asarray(pauli_z_diagonal(sorted(range(N)), set(range(N))))

    @jax.jit
    def step(th):
        e, g = jax.value_and_grad(
            lambda t: jnp.sum(runner(t) * diag)
        )(th)
        return e, th - 0.5 * g

    th = jnp.asarray(THETA0, jnp.float32)
    e0, th = step(th)
    for _ in range(29):
        e, th = step(th)
    assert float(e0) > -0.1  # starts far from the minimum
    assert float(e) < -0.95, (float(e0), float(e))


def test_param_ref_on_cut_gate_raises():
    c = Circuit(4, 4)
    for q in range(4):
        c.h(q)
    c.rzz(ParamRef(0, 0.7), 1, 2)  # the only 2q gate -> must be cut
    for q in range(4):
        c.measure(q, q)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=2,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    with pytest.raises(NotImplementedError, match="ParamRef"):
        make_differentiable_sweep(virt)


def test_param_ref_survives_copy_and_pickle():
    p = ParamRef(7, 1.25)
    for q in (copy.copy(p), copy.deepcopy(p),
              pickle.loads(pickle.dumps(p))):
        assert isinstance(q, ParamRef)
        assert q.index == 7 and float(q) == 1.25
    # arithmetic deliberately demotes to plain float
    assert not isinstance(p + 1.0, ParamRef)


def test_pauli_z_diagonal_subset():
    d = pauli_z_diagonal([0, 2, 5], {0, 5})
    # bit 0 carries clbit 0, bit 2 carries clbit 5
    assert d[0b000] == 1 and d[0b001] == -1
    assert d[0b010] == 1  # clbit 2 not in the observable
    assert d[0b100] == -1 and d[0b101] == 1


def test_param_ref_affine_derivations():
    p = ParamRef(3, 0.8)
    h = p.scaled(0.5)            # 0.4, theta[3]*0.5
    m = p.scaled(-2.0).shifted(1.0)  # -0.6, theta[3]*-2 + 1
    assert isinstance(h, ParamRef) and isinstance(m, ParamRef)
    assert h.index == m.index == 3
    assert float(h) == pytest.approx(0.4)
    assert (h.scale, h.shift) == (0.5, 0.0)
    assert float(m) == pytest.approx(-0.6)
    assert (m.scale, m.shift) == (-2.0, 1.0)
    assert m.base == pytest.approx(0.8)
    q = pickle.loads(pickle.dumps(m))
    assert (q.index, q.scale, q.shift, float(q)) == (3, -2.0, 1.0, float(m))
    with pytest.raises(ValueError, match="scale"):
        ParamRef(0, 1.0, scale=0.0)


def test_affine_param_refs_trace_correctly():
    """rz(theta/2) and rx(-2*theta + pi/4) built via scaled/shifted refs:
    the traced runner at theta' must equal a freshly-built concrete
    circuit at the derived angles."""
    th0, th1 = 0.9, -0.4

    def build(t0, t1, mark):
        c = Circuit(2, 2)
        a = ParamRef(0, t0).scaled(0.5) if mark else t0 * 0.5
        b = (ParamRef(1, t1).scaled(-2.0).shifted(np.pi / 4)
             if mark else -2.0 * t1 + np.pi / 4)
        c.ry(0.3, 0)
        c.rz(a, 0)
        c.rx(b, 1)
        c.cx(0, 1)
        c.measure(0, 0)
        c.measure(1, 1)
        return c

    cutter = Cutter(build(th0, th1, True), maxNPartitions=2,
                    maxNQubitsPerPartition=2, maxNQpdCuts=5, maxNCuts=5,
                    maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    runner, n_params = make_differentiable_sweep(virt)
    assert n_params == 2

    t0p, t1p = -0.35, 1.7
    got = np.asarray(jax.jit(runner)(jnp.asarray([t0p, t1p], jnp.float32)))
    cutter2 = Cutter(build(t0p, t1p, False), maxNPartitions=2,
                     maxNQubitsPerPartition=2, maxNQpdCuts=5, maxNCuts=5,
                     maxCutsPerPartitions=5)
    assert cutter2.solve()
    fresh, _ = run_virtual_circuit(
        VirtualCircuit(cutter2.getResultCircs()[3]), project=False
    )
    np.testing.assert_allclose(got, np.asarray(fresh.values), atol=1e-5)


# -- sampled (stochastic) differentiable sweep ----------------------------


def _full_grid_for(virt):
    from tests.test_qpd_sampling import _full_grid

    return _full_grid(virt)


def test_sampled_sweep_full_grid_identity_distribution():
    """make_sampled_sweep over the FULL label grid with exact mass must
    reproduce the exact differentiable sweep's knitted values at any
    theta (the unbiasedness identity), including through jax.grad."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
        make_sampled_sweep,
    )

    virt = _cut(_ansatz(THETA0))
    grid, mass = _full_grid_for(virt)
    exact, _ = make_differentiable_sweep(virt)
    samp, n_params = make_sampled_sweep(virt, grid, mass)
    assert n_params == 2 * N
    rng = np.random.default_rng(7)
    for _ in range(2):
        th = jnp.asarray(rng.uniform(-2, 2, 2 * N), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(samp(th)), np.asarray(exact(th)), atol=3e-6
        )

    def loss_s(th):
        return jnp.sum(samp(th) ** 2)

    def loss_e(th):
        return jnp.sum(exact(th) ** 2)

    th = jnp.asarray(THETA0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_s)(th)),
        np.asarray(jax.grad(loss_e)(th)), atol=2e-5,
    )


def test_sampled_sweep_full_grid_identity_observables():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
        make_sampled_sweep,
    )

    virt = _cut(_ansatz(THETA0))
    grid, mass = _full_grid_for(virt)
    z_sets = [[0], [0, 4], [1, 2, 3]]
    exact, _ = make_differentiable_sweep(virt, z_sets=z_sets)
    samp, _ = make_sampled_sweep(virt, grid, mass, z_sets=z_sets)
    th = jnp.asarray(THETA0, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(samp(th)), np.asarray(exact(th)), atol=3e-6
    )
    g_s = np.asarray(jax.grad(lambda t: samp(t)[1])(th))
    g_e = np.asarray(jax.grad(lambda t: exact(t)[1])(th))
    np.testing.assert_allclose(g_s, g_e, atol=2e-5)


def test_sampled_sweep_monte_carlo_estimates():
    """A real (sub-grid) label sample estimates the exact sweep within
    the analytic stderr scale, and one compiled program serves every
    theta (common random numbers across evaluations)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sample_label_counts,
        sampling_overhead,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
        make_sampled_sweep,
    )

    virt = _cut(_ansatz(THETA0))
    n = 4000
    uniq, counts = sample_label_counts(virt, n, seed=2)
    mass = counts.astype(np.float64) / n
    z_sets = [[0], [2, 3]]
    exact, _ = make_differentiable_sweep(virt, z_sets=z_sets)
    samp, _ = make_sampled_sweep(virt, uniq, mass, z_sets=z_sets)
    js = jax.jit(samp)
    gamma = sampling_overhead(virt)["gamma_total"]
    bound = 5 * gamma / np.sqrt(n)
    rng = np.random.default_rng(4)
    for _ in range(2):
        th = jnp.asarray(rng.uniform(-2, 2, 2 * N), jnp.float32)
        err = np.abs(np.asarray(js(th)) - np.asarray(exact(th)))
        assert (err < bound).all(), (err, bound)
