"""Thermal relaxation (T1/T2) in the trajectory noise engine.

The reference's fake backends carry qiskit ``thermal_relaxation_error``
per gate (FakeKolkataV2 calibration data, reference benchmark.py:94-103);
here the channel is an importance-sampled quantum-jump unravelling that
drops into every noisy engine via per-site Kraus banks
(ops/noise._relax_site, gate_noise_sites).  Verified against a dense
density-matrix oracle, an analytic 1-qubit case, and engine agreement.
"""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    NoiseModel,
    _depol_site,
    _relax_site,
    fake_kolkata_v2,
    run_noisy_virtual_circuit,
    simulate_noisy_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def test_relax_gamma_lambda_math():
    nm = NoiseModel(t1=1.0, t2=1.5)
    g, l = nm.relax_gamma_lambda(0, 0.2)
    assert g == pytest.approx(1 - np.exp(-0.2))
    assert l == pytest.approx(np.exp(-0.2) - np.exp(-0.4 / 1.5))
    # no relaxation configured -> identity channel
    assert NoiseModel().relax_gamma_lambda(0, 1.0) == (0.0, 0.0)
    assert not NoiseModel().has_relaxation
    assert NoiseModel(t1=1.0).has_relaxation
    # T2 > 2*T1 is unphysical: the extra dephasing clips at 0
    g, l = NoiseModel(t1=1.0, t2=5.0).relax_gamma_lambda(0, 0.3)
    assert l == 0.0 and g == pytest.approx(1 - np.exp(-0.3))
    # per-qubit vectors override scalars
    nmq = NoiseModel(t1=1.0, t1_q=np.array([1.0, 0.5]))
    assert nmq.relax_gamma_lambda(1, 0.2)[0] == pytest.approx(
        1 - np.exp(-0.4)
    )


def _block_to_complex(b):
    """Real [2,2,2,2] block -> complex 2x2 (inverse of to_real_block:
    block[r_out, row, r_in, col], [0,:,0,:] = Re, [1,:,0,:] = Im)."""
    return b[0, :, 0, :] + 1j * b[1, :, 0, :]


def test_relax_site_is_exact_channel():
    """sum_i q_i B_i rho B_i^dag equals the amplitude+phase damping
    channel on a random density matrix (the unbiasedness identity the
    trajectory mean converges to)."""
    gamma, lam = 0.23, 0.11
    probs, bank = _relax_site(gamma, lam)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    rho = a @ a.conj().T
    rho /= np.trace(rho)
    out = sum(
        q * (_block_to_complex(b) @ rho @ _block_to_complex(b).conj().T)
        for q, b in zip(probs, bank)
    )
    e1 = 1.0 - gamma
    expect = np.array([
        [rho[0, 0] + gamma * rho[1, 1],
         np.sqrt(e1 - lam) * rho[0, 1]],
        [np.sqrt(e1 - lam) * rho[1, 0],
         e1 * rho[1, 1]],
    ])
    np.testing.assert_allclose(out, expect, atol=1e-6)  # banks are f32
    assert probs.sum() == pytest.approx(1.0)


def test_one_qubit_analytic():
    """X then relax: P(0) = gamma exactly (balanced trajectories pin the
    branch counts, so the estimate converges at 1/k_traj)."""
    d = -np.log(0.8)  # gamma = 0.2
    nm = NoiseModel(p1=0.0, p2=0.0, readout01=0.0, readout10=0.0,
                    t1=1.0, t2=2.0, gate_time_1q=d, trajectories=512)
    c = Circuit(1, 1)
    c.x(0)
    c.measure(0, 0)
    v = np.asarray(simulate_noisy_circuit(c, nm, seed=3).values)
    assert v[0] == pytest.approx(0.2, abs=0.01)
    assert v.sum() == pytest.approx(1.0, abs=1e-5)


def _oracle_density_matrix(circ: Circuit, nm: NoiseModel) -> np.ndarray:
    """Dense density-matrix evolution applying the ENGINE's site
    convention per gate: the gate unitary, one depolarising site on the
    first qubit (rate by arity), then a thermal-relaxation channel on
    every touched qubit for the gate duration (gate_noise_sites)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.gates import (
        gate_matrix,
    )

    n = circ.num_qubits
    rho = np.zeros((1 << n, 1 << n), complex)
    rho[0, 0] = 1.0

    def lift(m2, q):
        ops = [np.eye(2)] * n
        ops[q] = m2
        full = ops[0]
        for o in ops[1:]:
            full = np.kron(full, o)
        return full

    def lift2(m4, qa, qb):
        # build the 2q operator on (qa, qb) by permutation of basis
        full = np.zeros((1 << n, 1 << n), complex)
        for i in range(1 << n):
            bi = [(i >> (n - 1 - k)) & 1 for k in range(n)]
            for r in range(4):
                ra, rb = r >> 1, r & 1
                ci = (bi[qa] << 1) | bi[qb]
                amp = m4[r, ci]
                if amp == 0:
                    continue
                bj = list(bi)
                bj[qa], bj[qb] = ra, rb
                j = sum(b << (n - 1 - k) for k, b in enumerate(bj))
                full[j, i] += amp
        return full

    def channel(rho, kraus_full):
        return sum(K @ rho @ K.conj().T for K in kraus_full)

    paulis = [np.eye(2), np.array([[0, 1], [1, 0]]),
              np.array([[0, -1j], [1j, 0]]), np.diag([1, -1])]
    for ins in circ.instructions:
        if ins.name in ("measure", "barrier"):
            continue
        u = gate_matrix(ins.name, ins.params)
        qs = list(ins.qubits)
        if len(qs) == 1:
            rho = lift(u, qs[0]) @ rho @ lift(u, qs[0]).conj().T
            p, dur = nm.rate_1q(qs[0]), nm.gate_time_1q
        else:
            U = lift2(u, qs[0], qs[1])
            rho = U @ rho @ U.conj().T
            p, dur = nm.rate_2q(qs[0], qs[1]), nm.gate_time_2q
        # depolarising site on the first qubit
        rho = channel(rho, [np.sqrt(w) * lift(P, qs[0]) for w, P in zip(
            [1 - p, p / 3, p / 3, p / 3], paulis)])
        # relaxation on every touched qubit
        for q in qs:
            gamma, lam = nm.relax_gamma_lambda(q, dur)
            e0 = max(0.0, 1.0 - gamma - lam)
            kr = [np.diag([1.0, np.sqrt(e0)]),
                  np.array([[0, np.sqrt(gamma)], [0, 0]]),
                  np.diag([0.0, np.sqrt(lam)])]
            rho = channel(rho, [lift(K, q) for K in kr])
    return rho


def test_density_matrix_differential():
    """Trajectory mean vs a dense density-matrix oracle on a 2-qubit
    circuit with both depolarising and T1/T2 noise."""
    c = Circuit(2, 2)
    c.h(0)
    c.cx(0, 1)
    c.rz(0.7, 1)
    c.h(1)
    c.measure(0, 0)
    c.measure(1, 1)
    nm = NoiseModel(p1=0.02, p2=0.05, readout01=0.0, readout10=0.0,
                    t1=1.0, t2=1.2, gate_time_1q=0.05, gate_time_2q=0.2,
                    trajectories=4096)
    v = np.asarray(simulate_noisy_circuit(c, nm, seed=11).values)
    rho = _oracle_density_matrix(c, nm)
    p_sv = np.real(np.diag(rho))
    # statevector index: qubit 0 = MSB; distribution: clbit j = index
    # bit j (little-endian) -> reverse the qubit axes
    expect = p_sv.reshape(2, 2).T.reshape(-1)
    assert expect.sum() == pytest.approx(1.0, abs=1e-6)
    assert 0.5 * np.abs(v - expect).sum() < 0.02


def _ghz_cut(n=4, caps=(3, 3)):
    c = Circuit(n, n)
    c.h(0)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for i in range(n):
        c.measure(i, i)
    cut = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=list(caps))
    assert cut.solve()
    return c, VirtualCircuit(cut.getResultCircs()[3])


def test_cut_engines_agree_with_relaxation():
    """Batched and streamed noisy engines agree under T1/T2 noise, and
    the non-unital bias (population decay toward |0>) shows: the GHZ
    |1111> peak loses more mass than |0000>."""
    c, virt = _ghz_cut()
    nm = NoiseModel(p1=1e-3, p2=5e-3, readout01=0.01, readout10=0.02,
                    t1=80e-6, t2=60e-6, trajectories=64)
    d1, _ = run_noisy_virtual_circuit(virt, nm, seed=5)
    d2, _ = run_noisy_virtual_circuit(virt, nm, seed=5, engine="streamed")
    v1, v2 = np.asarray(d1.values), np.asarray(d2.values)
    assert 0.5 * np.abs(v1 - v2).sum() < 0.03
    assert v1[0] > v1[-1]  # amplitude damping favours |0000>
    # a unital (depolarising-only) model shows no such asymmetry
    nm0 = NoiseModel(p1=1e-3, p2=5e-3, readout01=0.0, readout10=0.0,
                     trajectories=64)
    v0 = np.asarray(run_noisy_virtual_circuit(virt, nm0, seed=5)[0].values)
    assert abs(v0[0] - v0[-1]) < 0.02


def test_sampled_engine_relaxation():
    """The Monte-Carlo QPD sampling engine accepts T1/T2 models (the
    per-site Kraus banks flow through _simulate_label_rows_noisy)."""
    _, virt = _ghz_cut()
    nm = NoiseModel(p1=1e-3, p2=5e-3, readout01=0.005, readout10=0.01,
                    t1=80e-6, t2=60e-6, trajectories=16)
    d, _ = run_noisy_virtual_circuit(virt, nm, seed=2, engine="sampled",
                                     shots=4000)
    v = np.asarray(d.values)
    # non-unital branches make per-trajectory mass stochastic; the label
    # sample keeps the estimate unbiased but not exactly normalised
    assert v.sum() == pytest.approx(1.0, abs=0.15)
    assert v[0] + v[-1] > 0.6  # still GHZ-shaped


def test_untranspiled_rejects_relaxation():
    nm = fake_kolkata_v2(relaxation=True)
    nm.untranspiled = True
    c = Circuit(2, 2)
    c.h(0)
    c.measure(0, 0)
    with pytest.raises(AssertionError, match="relaxation"):
        simulate_noisy_circuit(c, nm, seed=0)


def test_fake_kolkata_relax_calibration():
    """relaxation=True only ADDS T1/T2 vectors — the depolarising and
    readout calibration is bit-identical to the recorded-parity model —
    and respects the physical T2 <= 2*T1 bound."""
    a, b = fake_kolkata_v2(), fake_kolkata_v2(relaxation=True)
    np.testing.assert_array_equal(a.p1_q, b.p1_q)
    np.testing.assert_array_equal(a.p2_q, b.p2_q)
    np.testing.assert_array_equal(a.ro01_q, b.ro01_q)
    np.testing.assert_array_equal(a.ro10_q, b.ro10_q)
    assert a.t1_q is None and b.t1_q is not None
    assert np.all(b.t2_q <= 2.0 * b.t1_q + 1e-18)
    assert b.has_relaxation and not a.has_relaxation


def test_depol_site_identity():
    """Depolarising site tables: probs sum to 1, identity branch weight
    1-p, Pauli branches p/3 each."""
    pr, bank = _depol_site(0.09)
    assert pr.sum() == pytest.approx(1.0)
    assert pr[0] == pytest.approx(0.91)
    assert bank.shape == (4, 2, 2, 2, 2)
