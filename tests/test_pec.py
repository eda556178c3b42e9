"""Probabilistic error cancellation (PEC).

The quasi-probability inverse of the depolarising channel, sampled with
the SAME importance-sampled signed-mixture estimator as the QPD knit
itself (ops/noise.pec_inverse_site): a noise site followed by its
inverse site is the identity channel in expectation, at a
prod(gamma_s)^2 variance cost.  The reference has no mitigation story.
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
    pec_inverse_site,
    run_noisy_virtual_circuit,
    simulate_noisy_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)

_PAULIS = [
    np.eye(2),
    np.array([[0, 1], [1, 0]]),
    np.array([[0, -1j], [1j, 0]]),
    np.diag([1, -1]),
]


def test_pec_inverse_site_math():
    """channel o quasi-inverse == identity on a random density matrix;
    sampling probs normalise; one-norm matches (1+eta/2)/(1-eta)."""
    p = 0.12
    probs, bank, w = pec_inverse_site(p)
    assert probs.sum() == pytest.approx(1.0)
    eta = 4 * p / 3
    assert np.abs(probs * w).sum() * 0 + np.abs(w[0]) == pytest.approx(
        (1 + eta / 2) / (1 - eta)
    )  # every branch weight has magnitude gamma
    signed = probs * w  # the true quasi-weights
    assert signed.sum() == pytest.approx(1.0)
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 2)) + 1j * rng.normal(size=(2, 2))
    rho = a @ a.conj().T
    rho /= np.trace(rho)
    dp = (1 - p) * rho + (p / 3) * sum(
        P @ rho @ P.conj().T for P in _PAULIS[1:]
    )
    inv = sum(wi * (P @ dp @ P.conj().T) for wi, P in zip(signed, _PAULIS))
    np.testing.assert_allclose(inv, rho, atol=1e-12)


def _ghz3():
    c = Circuit(3, 3)
    c.h(0)
    c.cx(0, 1)
    c.cx(1, 2)
    for i in range(3):
        c.measure(i, i)
    return c


def test_pec_uncut_recovers_ideal():
    c = _ghz3()
    ideal = np.asarray(simulate_circuit(c).values)
    kw = dict(p1=0.02, p2=0.08, readout01=0.0, readout10=0.0,
              trajectories=4096)
    vn = np.asarray(simulate_noisy_circuit(
        c, NoiseModel(**kw), seed=3).values)
    vp = np.asarray(simulate_noisy_circuit(
        c, NoiseModel(**kw, pec=True), seed=3).values)
    tv_noisy = 0.5 * np.abs(vn - ideal).sum()
    tv_pec = 0.5 * np.abs(vp - ideal).sum()
    assert tv_noisy > 0.08          # the noise visibly bites
    assert tv_pec < 0.02            # PEC cancels it (sampling residual)
    assert tv_pec < 0.2 * tv_noisy


def test_pec_cut_pipeline_recovers_ideal():
    c = _ghz3()
    ideal = np.asarray(simulate_circuit(c).values)
    cut = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=[2, 2])
    assert cut.solve()
    virt = VirtualCircuit(cut.getResultCircs()[3])
    kw = dict(p1=0.02, p2=0.08, readout01=0.0, readout10=0.0,
              trajectories=1024)
    dn, _ = run_noisy_virtual_circuit(virt, NoiseModel(**kw), seed=5)
    dp, _ = run_noisy_virtual_circuit(
        virt, NoiseModel(**kw, pec=True), seed=5)
    tv_noisy = 0.5 * np.abs(np.asarray(dn.values) - ideal).sum()
    tv_pec = 0.5 * np.abs(np.asarray(dp.values) - ideal).sum()
    assert tv_noisy > 0.08
    assert tv_pec < 0.02
    assert tv_pec < 0.2 * tv_noisy


def test_pec_composes_with_readout_mitigation():
    """PEC cancels gate noise; readout stays physical and is inverted
    separately — together they recover the ideal distribution."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.mitigation import (
        mitigate_readout,
    )

    c = _ghz3()
    ideal = np.asarray(simulate_circuit(c).values)
    nm = NoiseModel(p1=0.02, p2=0.08, readout01=0.02, readout10=0.05,
                    trajectories=4096, pec=True)
    noisy = simulate_noisy_circuit(c, nm, seed=3)
    mit = mitigate_readout(noisy, nm)
    tv = 0.5 * np.abs(np.asarray(mit.values) - ideal).sum()
    assert tv < 0.02


def test_pec_rejected_on_streaming_engines():
    c = _ghz3()
    cut = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=[2, 2])
    assert cut.solve()
    virt = VirtualCircuit(cut.getResultCircs()[3])
    nm = NoiseModel(p2=0.05, trajectories=4, pec=True)
    with pytest.raises(AssertionError, match="batched-engine-only"):
        run_noisy_virtual_circuit(virt, nm, engine="streamed")
    with pytest.raises(AssertionError, match="batched-engine-only"):
        run_noisy_virtual_circuit(virt, nm, engine="sampled", shots=64)


def test_pec_untranspiled_rejected():
    nm = NoiseModel(p2=0.05, pec=True, untranspiled=True)
    with pytest.raises(AssertionError, match="PEC"):
        simulate_noisy_circuit(_ghz3(), nm)
