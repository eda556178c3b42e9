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
