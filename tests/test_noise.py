"""Noise model tests: the fake-backend stand-in (SURVEY §2.4)."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut,
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    NoiseModel,
    default_noise_model,
    simulate_noisy_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)


def ghz(n):
    c = Circuit(n, n)
    c.h(0)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for q in range(n):
        c.measure(q, q)
    return c


def test_zero_noise_matches_ideal():
    nm = NoiseModel(p1=0.0, p2=0.0, readout01=0.0, readout10=0.0,
                    trajectories=2)
    circ = ghz(3)
    ideal = simulate_circuit(circ)
    noisy = simulate_noisy_circuit(circ, nm)
    assert hellinger_fidelity(ideal, noisy) == pytest.approx(1.0, abs=1e-5)


def test_noise_reduces_fidelity():
    nm = NoiseModel(p1=0.01, p2=0.05, readout01=0.03, readout10=0.03,
                    trajectories=32)
    circ = ghz(4)
    ideal = simulate_circuit(circ)
    noisy = simulate_noisy_circuit(circ, nm, seed=1)
    fid = hellinger_fidelity(ideal, noisy)
    assert 0.3 < fid < 0.999


def test_readout_error_only_distribution():
    nm = NoiseModel(p1=0.0, p2=0.0, readout01=0.1, readout10=0.0,
                    trajectories=1)
    c = Circuit(1, 1)
    c.measure(0, 0)  # |0> always
    noisy = simulate_noisy_circuit(c, nm)
    d = noisy.to_dict()
    assert d[0] == pytest.approx(0.9, abs=1e-6)
    assert d[1] == pytest.approx(0.1, abs=1e-6)


def test_noisy_cut_pipeline():
    """The reference's headline comparison (benchmark.py:94-103): noisy
    uncut vs noisy cut fidelities, computed end-to-end."""
    circ = ghz(5)
    cutter = Cutter(circ, 2, 3, maxNQpdCuts=5, maxNCuts=5,
                    maxCutsPerPartitions=5)
    assert cutter.solve()
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    nm = NoiseModel(p1=0.002, p2=0.02, readout01=0.02, readout10=0.02,
                    trajectories=8)
    res = compare_original_with_cut(circ, cut_circ, noise_model=nm)
    # oracle: exact legs still agree
    assert res.cut_vs_uncut_fidelity > 1 - 1e-5
    # noisy legs degrade but remain sane
    assert 0.2 < res.input_fidelity < 0.9999
    assert 0.2 < res.cut_fidelity < 1.01


# ---------------------------------------------------------------------------
# Untranspiled (reference-semantics) noise binding — r3 noisy-parity mode.
# Reference: qvm/run.py:40-43 (transpile commented out) + Aer's rule that a
# QuantumError binds to (instruction name, exact qubits) calibration entries.
# ---------------------------------------------------------------------------
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    fake_kolkata_v2,
    untranspiled_site_rate,
)


def test_untranspiled_binding_rules():
    nm = fake_kolkata_v2()
    # non-basis gates never bind
    assert untranspiled_site_rate(nm, "h", (0,)) == 0.0
    assert untranspiled_site_rate(nm, "t", (3,)) == 0.0
    assert untranspiled_site_rate(nm, "cz", (0, 1)) == 0.0
    assert untranspiled_site_rate(nm, "cp", (0, 1)) == 0.0
    assert untranspiled_site_rate(nm, "_defer", (0, 5)) == 0.0
    # basis 1q gates bind the per-qubit rate
    assert untranspiled_site_rate(nm, "x", (4,)) == nm.rate_1q(4)
    assert untranspiled_site_rate(nm, "sx", (9,)) == nm.rate_1q(9)
    # cx binds only on coupling-map pairs (either direction)
    assert untranspiled_site_rate(nm, "cx", (0, 1)) == nm.rate_2q(0, 1)
    assert untranspiled_site_rate(nm, "cx", (1, 0)) == nm.rate_2q(1, 0)
    assert untranspiled_site_rate(nm, "cx", (0, 2)) == 0.0  # not an edge


def test_untranspiled_zero_sites_is_exact_plus_readout():
    """A cz-only circuit binds no gate noise: noisy == readout(ideal)."""
    c = Circuit(3, 3)
    c.h(0)
    c.cz(0, 1)
    c.cz(1, 2)
    for q in range(3):
        c.measure(q, q)
    nm = fake_kolkata_v2()
    nm.untranspiled = True
    noisy = simulate_noisy_circuit(c, nm)

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        apply_readout_error,
    )

    expect = apply_readout_error(simulate_circuit(c), nm, bit_qubits=[0, 1, 2])
    np.testing.assert_allclose(
        np.asarray(noisy.values), np.asarray(expect.values), atol=1e-6
    )


def test_untranspiled_one_site_first_order_mixture():
    """One bound cx: noisy == (1-p) ideal + p/3 (X+Y+Z inserted), computed
    independently with dense complex numpy statevectors."""
    # ry (not a basis gate -> noise-free) instead of h, and a second ry on
    # the target: an UNBALANCED Bell pair, so P(01) != P(10) and the
    # little-endian comparison below actually detects bit-order swaps
    # (a balanced Bell + local unitaries always has |amp01| == |amp10|)
    c = Circuit(2, 2)
    c.ry(0.8, 0)
    c.cx(0, 1)  # (0,1) IS a heavy-hex edge -> binds
    c.ry(0.3, 1)
    c.measure(0, 0)
    c.measure(1, 1)
    nm = fake_kolkata_v2()
    nm.untranspiled = True
    # turn off readout so the gate mixture is isolated
    nm.ro01_q = nm.ro10_q = None
    nm.readout01 = nm.readout10 = 0.0
    noisy = simulate_noisy_circuit(c, nm)

    CX = np.array(
        [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 0, 1], [0, 0, 1, 0]], complex
    )
    X = np.array([[0, 1], [1, 0]], complex)
    Y = np.array([[0, -1j], [1j, 0]], complex)
    Z = np.diag([1, -1]).astype(complex)
    I = np.eye(2, dtype=complex)

    def ry(th):
        return np.array(
            [[np.cos(th / 2), -np.sin(th / 2)],
             [np.sin(th / 2), np.cos(th / 2)]],
            complex,
        )

    def probs(extra):
        psi = np.zeros(4, complex)
        psi[0] = 1.0
        psi = np.kron(ry(0.8), I) @ psi  # qubit 0 is the MSB
        psi = CX @ psi
        if extra is not None:
            psi = np.kron(extra, I) @ psi  # site qubit = first of the pair
        psi = np.kron(I, ry(0.3)) @ psi
        return np.abs(psi) ** 2

    p = nm.rate_2q(0, 1)
    expect = (1 - p) * probs(None) + (p / 3) * (
        probs(X) + probs(Y) + probs(Z)
    )
    # the oracle indexes big-endian (index 2*q0 + q1); Distribution.values
    # is little-endian (index q0 + 2*q1) — bit-reverse before comparing,
    # and the asymmetric RY ensures the reversal actually matters
    expect = expect.reshape(2, 2).T.reshape(4)
    assert abs(expect[1] - expect[2]) > 1e-3  # asymmetry guard
    np.testing.assert_allclose(
        np.asarray(noisy.values), expect, atol=5e-6
    )


def test_untranspiled_model_runs_fragments_exact():
    """Cut-leg semantics: an untranspiled model on fragments == ideal run
    (the reference's recorded cut fidelities are pure shot sampling)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        run_noisy_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = ghz(4)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=3, maxNCuts=3, maxCutsPerPartitions=3)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    nm = fake_kolkata_v2()
    nm.untranspiled = True
    noisy, _ = run_noisy_virtual_circuit(VirtualCircuit(cutter.getResultCircs()[3]), nm)
    ideal, _ = run_virtual_circuit(virt)
    np.testing.assert_allclose(
        np.asarray(noisy.values), np.asarray(ideal.values), atol=1e-6
    )


def test_batched_noisy_readout_matches_streamed_engine():
    """Regression for the r3 review finding: the batched noisy path applied
    per-qubit readout matrices to REVERSED bit positions (tensordot axis j
    is the most-significant local bit in a C-order reshape, but flat
    distributions are little-endian).  With strongly asymmetric per-qubit
    readout rates the batched and streamed engines must still agree."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        run_noisy_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = ghz(6)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=3, maxNCuts=3, maxCutsPerPartitions=3)
    assert cutter.solve()
    cut = cutter.getResultCircs()[3]

    nm = NoiseModel(
        name="asym", p1=0.0, p2=0.0, trajectories=1,
        ro01_q=np.array([0.4, 0.0, 0.0, 0.0, 0.0, 0.0]),
        ro10_q=np.array([0.4, 0.0, 0.0, 0.0, 0.0, 0.0]),
        num_qubits=6,
    )
    batched, _ = run_noisy_virtual_circuit(VirtualCircuit(cut), nm)
    streamed, _ = run_noisy_virtual_circuit(
        VirtualCircuit(cut), nm, engine="streamed"
    )
    np.testing.assert_allclose(
        np.asarray(batched.values), np.asarray(streamed.values), atol=2e-5
    )
    # NOTE no uncut comparison here: fragment-local qubit i maps to device
    # qubit i (NoiseModel docstring), so a rate pinned to device qubit 0
    # hits BOTH fragments' local qubit 0 — unlike the uncut run.  The
    # engines agreeing with each other is the regression being locked.


def test_compare_original_with_cut_untranspiled_bands():
    """The CLI's --simulate path (untranspiled FakeKolkataV2, both legs
    1000-shot): reference-shaped bands for a ghz-8 cut."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        fake_kolkata_v2,
    )

    c = ghz(8)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=5,
                    maxNQpdCuts=3, maxNCuts=3, maxCutsPerPartitions=3)
    assert cutter.solve()
    cut = cutter.getResultCircs()[3]
    nm = fake_kolkata_v2()
    nm.untranspiled = True
    res = compare_original_with_cut(c, cut, noise_model=nm, shots=1000,
                                    seed=3)
    # readout on 8 bits + a few coupled-cx sites: ~0.85-0.95
    assert 0.80 < res.input_fidelity < 0.97, res
    # fragments bind no noise: two-sided shot sampling of a 2-peak distr
    assert res.cut_fidelity > 0.95, res
    assert res.cut_vs_uncut_fidelity > 0.99, res


def test_batched_vs_streamed_with_routed_calibrated_model():
    """With a coupling-map model (fragments routed, per-qubit calibrated
    gate + readout rates at device nodes) the batched and streamed noisy
    engines must agree exactly when gate noise is zeroed (routing and
    readout lookups are deterministic; trajectory draws only differ)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.routing import (
        HEAVY_HEX_27,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        run_noisy_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = ghz(6)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=3, maxNCuts=3, maxCutsPerPartitions=3)
    assert cutter.solve()
    cut = cutter.getResultCircs()[3]

    rng = np.random.default_rng(5)
    nm = NoiseModel(
        name="routed-ro", p1=0.0, p2=0.0, trajectories=1,
        ro01_q=rng.uniform(0.0, 0.2, 27),
        ro10_q=rng.uniform(0.0, 0.2, 27),
        num_qubits=27, coupling=HEAVY_HEX_27,
    )
    batched, _ = run_noisy_virtual_circuit(VirtualCircuit(cut), nm)
    streamed, _ = run_noisy_virtual_circuit(
        VirtualCircuit(cut), nm, engine="streamed"
    )
    np.testing.assert_allclose(
        np.asarray(batched.values), np.asarray(streamed.values), atol=2e-5
    )


def test_deferral_ops_noise_free_without_coupling():
    """Measure-deferral bookkeeping CX ops (statevector.py:168-201) must
    carry no gate noise in the coupling-less path too — only routed (phys
    None markers) and untranspiled paths zeroed them before."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
    )

    c = Circuit(2, 2)
    c.h(0)
    c.measure(0, 0)  # mid-circuit -> deferral ancilla CX
    c.x(0)
    c.measure(0, 1)
    nm = NoiseModel(p1=0.0, p2=0.5, readout01=0.0, readout10=0.0,
                    trajectories=4, coupling=None)
    noisy = simulate_noisy_circuit(c, nm)
    # the x between the measures forces c1 = NOT c0, so (0,0) and (1,1)
    # are impossible regardless of depolarising strength — any mass there
    # means a bookkeeping op picked up gate noise.  Little-endian keys:
    # index = c0 + 2*c1, impossible indices 0 and 3.
    vals = np.asarray(noisy.values)
    np.testing.assert_allclose(vals[0], 0.0, atol=1e-6)
    np.testing.assert_allclose(vals[3], 0.0, atol=1e-6)
    np.testing.assert_allclose(vals[1] + vals[2], 1.0, atol=1e-5)


def test_balanced_pauli_allocation():
    """Trajectory Pauli draws are balanced: per (row, site) the number
    of inserted Paulis along the trajectory axis is floor/ceil of its
    expectation, the marginal insertion rate stays exactly p (unbiased),
    and X/Y/Z are drawn with equal conditional mass."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        _pauli_idx,
    )

    rng = np.random.default_rng(3)
    for p in (0.01, 0.1, 0.4):
        ids = _pauli_idx(rng, p, (400, 16), balance_axis=1)
        nz = (ids != 0).sum(axis=1)
        exp = 16 * p
        assert nz.min() >= np.floor(exp) and nz.max() <= np.ceil(exp), p
        # unbiased marginal (400*16 = 6400 draws; 5 sigma)
        tol = 5 * np.sqrt(p * (1 - p) / ids.size)
        assert abs(float(np.mean(ids != 0)) - p) < tol, p
    # the three Paulis are symmetric
    ids = _pauli_idx(rng, 0.4, (2000, 16), balance_axis=1)
    counts = np.bincount(ids.reshape(-1), minlength=4)[1:]
    assert counts.std() / counts.mean() < 0.05
    # iid fallback path (balance_axis=None) keeps the same dtype/shape
    iid = _pauli_idx(rng, 0.1, (5, 7))
    assert iid.shape == (5, 7) and iid.dtype == np.int32


def test_streamed_pauli_indices_balanced_and_empty():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        _sample_pauli_indices,
    )

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        _depol_site,
    )

    rng = np.random.default_rng(0)
    tabs = [_depol_site(0.1), _depol_site(0.02)]
    idx = _sample_pauli_indices(rng, tabs, 64, 16)
    assert idx.shape == (64, 16, 2) and idx.dtype == np.int32
    nz = (idx != 0).sum(axis=1)  # [64, 2] insertions per (label, site)
    assert nz[:, 0].max() <= 2 and nz[:, 0].min() >= 1   # 16*0.1 = 1.6
    assert nz[:, 1].max() <= 1                            # 16*0.02 = 0.32
    empty = _sample_pauli_indices(rng, [], 8, 4)
    assert empty.shape == (8, 4, 0)
