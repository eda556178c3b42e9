"""Pallas fragment-kernel tests (interpret mode on CPU): results must match
the XLA variant engine exactly."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    Instruction,
    Register,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_sv import (
    run_fragment_pallas,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_fragment,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
    VirtualGateOp,
)


def vgate(name, qubits, params=()):
    return Instruction(
        "vgate", list(qubits), params=list(params),
        op=VirtualGateOp(name, tuple(params)),
    )


def compare_engines(virt, tol=2e-5):
    for reg in virt.fragments:
        res_p = run_fragment_pallas(virt, reg.name, interpret=True)
        assert res_p is not None, f"pallas fallback hit for {reg.name}"
        res_x = run_fragment(virt, reg.name)
        assert res_p.touching == res_x.touching
        assert res_p.bit_positions == res_x.bit_positions
        np.testing.assert_allclose(
            res_p.values, res_x.values, atol=tol,
            err_msg=f"fragment {reg.name}",
        )


def test_gate_cut_cz_matches_xla():
    cut = Circuit([Register("frag0", 2), Register("frag1", 2)], 4)
    cut.h(0)
    cut.cx(0, 1)
    cut.ry(0.3, 2)
    cut.append(vgate("cz", [1, 2]))
    cut.rx(0.7, 1)
    cut.cx(2, 3)
    for i, q in enumerate([0, 1, 2, 3]):
        cut.measure(q, i)
    compare_engines(VirtualCircuit(cut))


def test_wire_cut_move_matches_xla():
    cut = Circuit([Register("frag0", 2), Register("frag1", 2)], 3)
    cut.h(0)
    cut.cx(0, 1)
    cut.append(vgate("move", [1, 2]))
    cut.cx(2, 3)
    cut.measure(0, 0)
    cut.measure(2, 1)
    cut.measure(3, 2)
    compare_engines(VirtualCircuit(cut))


def test_mixed_cuts_full_knit_fidelity():
    orig = Circuit(4, 4)
    orig.h(0)
    orig.ry(0.4, 1)
    orig.h(2)
    orig.rz(0.2, 3)
    orig.cz(0, 1)
    orig.cp(1.1, 1, 2)
    orig.cx(2, 3)
    for q in range(4):
        orig.measure(q, q)
    cutter = Cutter(orig, 2, 3, maxNQpdCuts=5, maxNCuts=5,
                    maxCutsPerPartitions=5)
    assert cutter.solve()
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    virt = VirtualCircuit(cut_circ)
    results = [
        run_fragment_pallas(virt, reg.name, interpret=True)
        for reg in virt.fragments
    ]
    assert all(r is not None for r in results)
    knitted = knit(virt, results)
    ideal = simulate_circuit(orig)
    assert hellinger_fidelity(ideal, knitted) > 1 - 1e-5


def test_fallback_for_reset():
    cut = Circuit([Register("frag0", 2)], 2)
    cut.h(0)
    cut.reset(0)
    cut.measure(0, 0)
    cut.measure(1, 1)
    virt = VirtualCircuit(cut)
    assert run_fragment_pallas(virt, "frag0", interpret=True) is None
