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
