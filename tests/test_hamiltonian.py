"""Pauli-Hamiltonian observables + VQE on cut circuits (ops/hamiltonian).

The reference has no observable machinery (its pipeline ends at a sampled
distribution; qcg ansatz generators are sampling-only) — this is a
TPU-native extension.  Oracle: dense Hamiltonian matrix applied to the
uncut statevector.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (
    dense_matrix,
    group_qubitwise,
    make_hamiltonian_energy,
    measurement_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    compile_circuit,
    run_statevector_host,
)

CUT_KW = dict(maxNPartitions=2, maxNQubitsPerPartition=4,
              maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)

N = 6


def tfim_terms(n, j=1.0, h=0.7):
    """Transverse-field Ising chain: -J sum Z_i Z_{i+1} - h sum X_i."""
    terms = []
    for i in range(n - 1):
        zz = ["I"] * n
        zz[i] = zz[i + 1] = "Z"
        terms.append((-j, "".join(zz)))
    for i in range(n):
        x = ["I"] * n
        x[i] = "X"
        terms.append((-h, "".join(x)))
    return terms


def _ansatz(thetas, n=N, mark=True):
    c = Circuit(n, n)
    for q in range(n):
        v = float(thetas[q])
        c.ry(ParamRef(q, v) if mark else v, q)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for q in range(n):
        v = float(thetas[n + q])
        c.ry(ParamRef(n + q, v) if mark else v, q)
    return c


def _oracle_energy(circ_no_measure, terms):
    state = run_statevector_host(compile_circuit(circ_no_measure))
    psi = state[0].astype(np.complex128) + 1j * state[1]
    h = dense_matrix(terms, circ_no_measure.num_qubits)
    return float(np.real(psi.conj() @ (h @ psi)))


def test_group_qubitwise():
    groups = group_qubitwise([
        (1.0, "ZZII"), (1.0, "IIZZ"), (0.5, "XIXI"), (0.2, "IYII"),
    ])
    # ZZII+IIZZ share a basis; XIXI and IYII merge into XYXI
    bases = {b for b, _ in groups}
    assert bases == {"ZZZZ", "XYXI"}
    assert sum(len(m) for _, m in groups) == 4


def test_dense_matrix_conventions():
    # qubit 0 is the MSB: Z on qubit 0 of 2 -> diag(1, 1, -1, -1)
    m = dense_matrix([(1.0, "ZI")], 2)
    np.testing.assert_allclose(np.diag(m).real, [1, 1, -1, -1])
    m = dense_matrix([(1.0, "IZ")], 2)
    np.testing.assert_allclose(np.diag(m).real, [1, -1, 1, -1])


def test_measurement_circuit_rejects_measured_ansatz():
    c = Circuit(2, 2)
    c.h(0)
    c.measure(0, 0)
    with pytest.raises(ValueError, match="measure"):
        measurement_circuit(c, "ZI")


def test_energy_matches_statevector_oracle():
    rng = np.random.default_rng(11)
    th = rng.uniform(-2, 2, 2 * N)
    terms = tfim_terms(N) + [(0.3, "IYIZIX"), (1.5, "I" * N)]
    energy, info = make_hamiltonian_energy(_ansatz(th), CUT_KW, terms)
    assert info.n_params == 2 * N
    assert info.n_groups < len(terms)  # grouping actually groups
    got = float(jax.jit(energy)(jnp.asarray(th, jnp.float32)))
    want = _oracle_energy(_ansatz(th, mark=False), terms)
    assert abs(got - want) < 5e-4, (got, want)


def test_energy_gradient_matches_finite_differences():
    rng = np.random.default_rng(5)
    th = rng.uniform(-1, 1, 2 * N)
    terms = tfim_terms(N)
    energy, _ = make_hamiltonian_energy(_ansatz(th), CUT_KW, terms)
    je = jax.jit(energy)
    g = np.asarray(jax.grad(energy)(jnp.asarray(th, jnp.float32)))
    eps = 1e-2
    for i in [0, N, 2 * N - 1]:
        tp = th.copy(); tp[i] += eps
        tm = th.copy(); tm[i] -= eps
        fd = (
            float(je(jnp.asarray(tp, jnp.float32)))
            - float(je(jnp.asarray(tm, jnp.float32)))
        ) / (2 * eps)
        assert abs(g[i] - fd) < 5e-3, (i, g[i], fd)


def test_vqe_reaches_tfim_ground_state():
    """Gradient descent on the cut ansatz must reach the TFIM ground
    energy (dense-diagonalization oracle) to ~2% of the spectral width."""
    terms = tfim_terms(N)
    evals = np.linalg.eigvalsh(dense_matrix(terms, N))
    e_min, width = float(evals[0]), float(evals[-1] - evals[0])

    th0 = np.linspace(0.2, 1.9, 2 * N)
    energy, info = make_hamiltonian_energy(_ansatz(th0), CUT_KW, terms)

    @jax.jit
    def step(th):
        e, g = jax.value_and_grad(energy)(th)
        return e, th - 0.1 * g

    th = jnp.asarray(th0, jnp.float32)
    for _ in range(120):
        e, th = step(th)
    assert float(e) < e_min + 0.02 * width, (float(e), e_min)


def test_contract_mode_matches_distribution_mode_and_oracle():
    rng = np.random.default_rng(17)
    th = rng.uniform(-2, 2, 2 * N)
    terms = tfim_terms(N) + [(0.4, "ZIXIYI")]
    e_dist, _ = make_hamiltonian_energy(
        _ansatz(th), CUT_KW, terms, contract=False)
    e_con, _ = make_hamiltonian_energy(
        _ansatz(th), CUT_KW, terms, contract=True)
    t = jnp.asarray(th, jnp.float32)
    a, b = float(e_dist(t)), float(e_con(t))
    want = _oracle_energy(_ansatz(th, mark=False), terms)
    assert abs(a - b) < 2e-5, (a, b)
    assert abs(b - want) < 5e-4, (b, want)
    ga = np.asarray(jax.grad(e_dist)(t))
    gb = np.asarray(jax.grad(e_con)(t))
    np.testing.assert_allclose(ga, gb, atol=2e-5)


def test_wide_vqe_energy_16q_contraction():
    """16 qubits, 2x(8+1) fragments: the contraction path (auto above 12q)
    never builds a 2^16 distribution; energy matches the host statevector
    oracle and one gradient step lowers it."""
    n = 16
    rng = np.random.default_rng(3)
    th = rng.uniform(-1.5, 1.5, 2 * n)

    def ansatz(mark=True):
        c = Circuit(n, n)
        for q in range(n):
            v = float(th[q])
            c.ry(ParamRef(q, v) if mark else v, q)
        for i in range(n - 1):
            c.cx(i, i + 1)
        for q in range(n):
            v = float(th[n + q])
            c.ry(ParamRef(n + q, v) if mark else v, q)
        return c

    terms = tfim_terms(n)
    kw = dict(maxNPartitions=2, maxNQubitsPerPartition=9,
              maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    energy, info = make_hamiltonian_energy(ansatz(), kw, terms)
    assert info.n_groups == 2

    # oracle: per-term expectation on the uncut host statevector
    got = float(jax.jit(energy)(jnp.asarray(th, jnp.float32)))
    state = run_statevector_host(compile_circuit(ansatz(mark=False)))
    psi = state[0].astype(np.complex128) + 1j * state[1]
    want = 0.0
    for coeff, pauli in terms:
        # apply the Pauli string without densifying H: all terms are
        # products of Z (diag signs) and X (bit flips)
        idx = np.arange(1 << n)
        phase = np.ones(1 << n)
        flip = np.zeros(1 << n, np.int64)
        for q, ch in enumerate(pauli):
            bit = (idx >> (n - 1 - q)) & 1
            if ch == "Z":
                phase = phase * (1.0 - 2.0 * bit)
            elif ch == "X":
                flip ^= 1 << (n - 1 - q)
            elif ch == "Y":
                raise AssertionError("tfim has no Y terms")
        want += coeff * float(np.real(psi.conj() @ (phase * psi[idx ^ flip])))
    assert abs(got - want) < 2e-3, (got, want)

    e_and_g = jax.jit(jax.value_and_grad(energy))
    e0, g = e_and_g(jnp.asarray(th, jnp.float32))
    e1, _ = e_and_g(jnp.asarray(th, jnp.float32) - 0.1 * g)
    assert float(e1) < float(e0)


def test_qaoa_maxcut_energy_and_gradient_on_cut_circuit():
    """The reference's QAOA+ generator (helper_functions.py:34-63), built
    with affine-derived ParamRefs (gamma/2, -2*beta share one theta entry
    each), through the differentiable cut pipeline: energy must match the
    dense oracle and a gradient step must increase the expected cut."""
    import networkx as nx

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qaoa import (
        construct_qaoa_plus,
    )

    n = 6
    graph = nx.path_graph(n)  # one crossing edge -> 2 cx cuts
    terms = []
    for i, j in graph.edges():
        p = ["I"] * n
        p[i] = p[j] = "Z"
        terms.append((0.5, "".join(p)))
    terms.append((-0.5 * graph.number_of_edges(), "I" * n))

    th = np.array([0.7, 0.5])
    kw = dict(maxNPartitions=2, maxNQubitsPerPartition=n // 2 + 1,
              maxNQpdCuts=6, maxNCuts=6, maxCutsPerPartitions=6)
    energy, info = make_hamiltonian_energy(
        construct_qaoa_plus(
            P=1, G=graph, params=[ParamRef(0, th[0]), ParamRef(1, th[1])]
        ),
        kw, terms,
    )
    assert info.n_params == 2
    assert info.n_groups == 1  # all-ZZ terms commute qubit-wise

    got = float(jax.jit(energy)(jnp.asarray(th, jnp.float32)))
    state = run_statevector_host(
        compile_circuit(construct_qaoa_plus(
            P=1, G=graph, params=[float(th[0]), float(th[1])]
        ))
    )
    psi = state[0].astype(np.complex128) + 1j * state[1]
    h = dense_matrix(terms, n)
    want = float(np.real(psi.conj() @ (h @ psi)))
    assert abs(got - want) < 2e-3, (got, want)

    e_and_g = jax.jit(jax.value_and_grad(energy))
    e0, g = e_and_g(jnp.asarray(th, jnp.float32))
    e1, _ = e_and_g(jnp.asarray(th, jnp.float32) - 0.1 * g)
    assert float(e1) < float(e0)


def test_stochastic_vqe_energy_and_gradient():
    """num_samples= (stochastic VQE): the sampled energy brackets the
    exact one at the analytic stderr scale, jax.grad runs through it,
    and contract=False is rejected."""
    rng = np.random.default_rng(23)
    th = rng.uniform(-1.5, 1.5, 2 * N)
    terms = tfim_terms(N)
    with pytest.raises(ValueError, match="contract"):
        make_hamiltonian_energy(_ansatz(th), CUT_KW, terms,
                                contract=False, num_samples=100)
    e_exact, _ = make_hamiltonian_energy(_ansatz(th), CUT_KW, terms)
    e_samp, info = make_hamiltonian_energy(
        _ansatz(th), CUT_KW, terms, num_samples=6000, sample_seed=3,
        sample_method="lhs",
    )
    assert info.instances_per_step > 0
    t = jnp.asarray(th, jnp.float32)
    a = float(jax.jit(e_samp)(t))
    b = float(e_exact(t))
    # |H| ~ sum |coeff| ~ 9.2; gamma/sqrt(n) ~ stderr scale per group
    assert abs(a - b) < 0.5, (a, b)
    g = np.asarray(jax.grad(e_samp)(t))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-3


def test_stochastic_vqe_full_budget_is_exact():
    """A sample budget that enumerates the whole grid makes the
    stochastic energy agree with the exact one to fp tolerance for the
    uniform-coefficient cut (every label drawn ~equally often is NOT
    enough — this checks the estimator algebra, so use the full-grid
    mass via a huge LHS budget only when the grid is small)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
        make_sampled_sweep,
    )
    from tests.test_qpd_sampling import _full_grid
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (
        measurement_circuit,
    )

    rng = np.random.default_rng(29)
    th = rng.uniform(-1.5, 1.5, 2 * N)
    circ = measurement_circuit(_ansatz(th), "Z" * N)
    cutter = Cutter(circ, **CUT_KW)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    grid, mass = _full_grid(virt)
    z_sets = [[i, i + 1] for i in range(N - 1)]
    samp, _ = make_sampled_sweep(virt, grid, mass, z_sets=z_sets)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
        make_differentiable_sweep,
    )

    exact, _ = make_differentiable_sweep(virt, z_sets=z_sets)
    t = jnp.asarray(th, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(samp(t)), np.asarray(exact(t)), atol=3e-6
    )
