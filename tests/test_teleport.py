"""Real teleportation execution (virt/teleport.py, VERDICT r3 #7).

The reference prices teleport cuts but never executes them
(/root/reference/src/HwAwareCutter/Cutter.py:574 FIXME — they fall
through to QPD).  Here a teleport-cut plan runs the actual EPR-gadget
protocol: fidelity 1.0 vs the uncut oracle, zero sampling fan-out for
the teleported cuts, and resource accounting matching the plan's
S/A/L metrics.
"""
import math

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.teleport import (
    expand_teleport_cuts,
    has_teleport_cuts,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _tele_plan(circ, caps, **kw):
    """Solve with maxNQpdCuts=0: every cut must be a teleport
    (S stays 1) — the ghz8_tele_only sweep config's shape
    (topology_teleport_sweep.json)."""
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=caps,
                    maxNQpdCuts=0, **kw)
    assert cutter.solve()
    return cutter


def _gadget_fidelity(circ, cutter):
    cut = cutter.getResultCircs()[3]
    assert has_teleport_cuts(cut)
    dist, _ = run_virtual_circuit(
        VirtualCircuit(cut), teleport="execute"
    )
    oracle = simulate_circuit(circ)
    return hellinger_fidelity(oracle, dist), cut


@pytest.mark.parametrize("name,n,caps", [
    ("ghz", 8, 6),
    ("bv", 6, 5),
])
def test_teleport_gate_cut_executes_exactly(name, n, caps):
    circ = genCirc(name, n, 1)
    cutter = _tele_plan(circ, caps)
    m = cutter.plan.metrics
    n_tele = sum(1 for c in cutter.plan.cuts if c.teleport)
    assert n_tele >= 1 and m.S == 1  # teleports carry no sampling cost
    assert m.L == 10 * n_tele        # latency accounting (Cutter table)
    fid, cut = _gadget_fidelity(circ, cutter)
    assert fid > 1 - 1e-6
    # resource accounting: 2 EPR ancillas per teleported gate cut (the
    # cost table's +2), 1 per teleported wire cut (the vmove qubit is
    # the EPR's receiving half)
    gate_tele = sum(
        1 for c in cutter.plan.cuts if c.teleport and c.kind == "gate"
    )
    wire_tele = n_tele - gate_tele
    expanded = expand_teleport_cuts(cut)
    assert expanded.num_qubits == (
        cut.num_qubits + 2 * gate_tele + wire_tele
    )
    # and no variant fan-out remains for pure-teleport plans
    virt = VirtualCircuit(expanded)
    assert virt.total_instantiations() == len(virt.fragments)


def test_teleport_differential_vs_qpd_route():
    """The same plan through teleport='execute' and the (reference
    parity) QPD route must produce the same distribution — on a circuit
    with a nontrivial output state."""
    circ = Circuit(6, 6)
    for q in range(6):
        circ.h(q)
        circ.rz(0.3 + 0.2 * q, q)
    for q in range(5):
        circ.cx(q, q + 1)
    circ.cp(math.pi / 3, 0, 5)
    for q in range(6):
        circ.measure(q, q)
    cutter = _tele_plan(circ, 5)
    cut = cutter.getResultCircs()[3]
    virt = VirtualCircuit(cut)
    tele_dist, _ = run_virtual_circuit(virt, teleport="execute")
    qpd_dist, _ = run_virtual_circuit(virt, teleport="qpd")
    oracle = simulate_circuit(circ)
    assert hellinger_fidelity(oracle, tele_dist) > 1 - 1e-6
    assert hellinger_fidelity(oracle, qpd_dist) > 1 - 1e-6
    np.testing.assert_allclose(
        np.asarray(tele_dist.values), np.asarray(qpd_dist.values),
        atol=2e-5,
    )


def test_teleport_mixed_with_qpd_cuts():
    """maxNQpdCuts quirk (Cutter.py:535-540): with teleports present the
    QPD count is pinned to maxNQpdCuts — a mixed plan executes with the
    teleport gadget for the TELE cuts and the QPD knit for the rest."""
    circ = genCirc("ghz", 9, 1)
    cutter = Cutter(circ, maxNPartitions=3, maxNQubitsPerPartition=4,
                    maxNQpdCuts=1)
    assert cutter.solve()
    n_tele = sum(1 for c in cutter.plan.cuts if c.teleport)
    n_qpd = len(cutter.plan.cuts) - n_tele
    assert n_tele == 1 and n_qpd == 1  # quirk pins #QPD == maxNQpdCuts
    fid, _cut = _gadget_fidelity(circ, cutter)
    assert fid > 1 - 1e-6


def test_teleport_wire_cut_teledata():
    """Force a teleported wire cut; the vmove destination doubles as the
    EPR receiving half (1 fresh ancilla)."""
    circ = genCirc("ghz", 6, 1)
    # caps 5: the tele-wire's target partition pays +1 (incoming wire)
    # +1 (teleport endpoint) on top of its 3 initial qubits
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                    maxNQpdCuts=0, forceNWireCuts=1, forceNGateCuts=0)
    assert cutter.solve()
    n_tele = sum(
        1 for c in cutter.plan.cuts if c.teleport and c.kind == "wire"
    )
    assert n_tele == 1
    fid, cut = _gadget_fidelity(circ, cutter)
    assert fid > 1 - 1e-6
    expanded = expand_teleport_cuts(cut)
    assert expanded.num_qubits == cut.num_qubits + 1


def test_teleport_execute_noop_without_tele_cuts():
    circ = genCirc("ghz", 6, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=2, maxNCuts=2)
    assert cutter.solve()
    cut = cutter.getResultCircs()[3]
    assert not has_teleport_cuts(cut)
    assert expand_teleport_cuts(cut) is cut
    dist, _ = run_virtual_circuit(VirtualCircuit(cut), teleport="execute")
    assert hellinger_fidelity(simulate_circuit(circ), dist) > 1 - 1e-6


def test_teleport_composes_with_sampled_engine():
    """teleport='execute' + engine='sampled': the merged-fragment plan's
    remaining QPD cut runs through the Monte-Carlo estimator."""
    circ = genCirc("ghz", 9, 1)
    cutter = Cutter(circ, maxNPartitions=3, maxNQubitsPerPartition=4,
                    maxNQpdCuts=1)
    assert cutter.solve()
    assert any(c.teleport for c in cutter.plan.cuts)
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    dist, _ = run_virtual_circuit(
        virt, teleport="execute", engine="sampled", shots=20000,
        sample_method="lhs", sample_cv=True,
    )
    oracle = simulate_circuit(circ)
    assert hellinger_fidelity(oracle, dist) > 1 - 5e-3
