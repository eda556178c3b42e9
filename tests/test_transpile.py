"""Transpiler-lite tests: basis rewrite must preserve distributions."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.transpile import (
    BASIS,
    count_cnots,
    transpile_to_basis,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.random_circuit import (
    random_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)


def test_random_circuits_preserved():
    for seed in range(4):
        circ = random_circuit(4, 4, seed=seed, measure=True)
        t = transpile_to_basis(circ)
        for ins in t.instructions:
            assert ins.name in BASIS + ("measure", "barrier", "reset"), ins
        fid = hellinger_fidelity(simulate_circuit(circ), simulate_circuit(t))
        assert fid > 1 - 1e-4, (seed, fid)


def test_cnot_counting():
    c = Circuit(2, 2)
    c.h(0)
    c.cz(0, 1)
    c.swap(0, 1)
    c.measure(0, 0)
    c.measure(1, 1)
    t = transpile_to_basis(c)
    assert count_cnots(t) == 4  # cz -> 1, swap -> 3


def test_merge_reduces_1q_count():
    c = Circuit(1)
    for _ in range(10):
        c.h(0)
        c.t(0)
    t = transpile_to_basis(c, optimize=True)
    assert len(t.instructions) <= 5


def test_transpile_preserves_distribution_h_heavy():
    """Regression for the r3 ZSX-identity bug: an h-h-cx-h circuit
    transpiled with the broken Ry decomposition scored fidelity 0.25."""
    circ = Circuit(2, 2)
    circ.h(0)
    circ.h(1)
    circ.cx(0, 1)
    circ.h(1)
    circ.measure(0, 0)
    circ.measure(1, 1)
    t = transpile_to_basis(circ)
    fid = hellinger_fidelity(simulate_circuit(circ), simulate_circuit(t))
    assert fid > 1 - 1e-9, fid


def test_transpile_random_circuits_distribution():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.random_circuit import (
        random_circuit,
    )

    for seed in range(8):
        circ = random_circuit(4, 6, seed=seed, measure=True)
        t = transpile_to_basis(circ)
        fid = hellinger_fidelity(
            simulate_circuit(circ), simulate_circuit(t)
        )
        assert fid > 1 - 1e-6, (seed, fid)


def test_transpile_fsim_exact():
    """fsim must decompose exactly (it reaches every transpiled sycamore
    run); the old placeholder emitted three bare CXs."""
    import numpy as np

    for th, ph in [(0.3, 0.8), (1.1, -0.4), (np.pi / 2, np.pi / 6)]:
        circ = Circuit(2, 2)
        circ.h(0)
        circ.ry(0.4, 1)
        circ.fsim(th, ph, 0, 1)
        circ.measure(0, 0)
        circ.measure(1, 1)
        t = transpile_to_basis(circ)
        names = {i.name for i in t.instructions}
        assert names <= {"cx", "rz", "sx", "x", "measure", "barrier"}, names
        fid = hellinger_fidelity(
            simulate_circuit(circ), simulate_circuit(t)
        )
        assert fid > 1 - 1e-9, (th, ph, fid)


def test_transpile_preserves_conditions():
    """A c_if-conditioned gate must keep its classical control through
    the basis rewrite (dynamic qubit reuse emits these)."""
    circ = Circuit(2, 2)
    circ.h(0)
    circ.measure(0, 0)
    circ.x(1).condition = (0, 1)
    circ.measure(1, 1)
    t = transpile_to_basis(circ)
    conds = [i.condition for i in t.instructions
             if getattr(i, "condition", None) is not None]
    assert conds and all(c == (0, 1) for c in conds)
    fid = hellinger_fidelity(simulate_circuit(circ), simulate_circuit(t))
    assert fid > 1 - 1e-9, fid
