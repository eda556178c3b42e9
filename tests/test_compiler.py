"""L8 compiler pass tests: heuristic virtualization/wire cutting must produce
cut circuits whose knitted result matches the uncut oracle."""
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.compiler import (
    CutterCompiler,
    QVMCompiler,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.dag import (
    DAG,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.passes import (
    BisectionPass,
    GreedyDependencyBreaker,
    OptimalDecompositionPass,
    OptimalWireCutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.qubit_reuser import (
    apply_qubit_reuse,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.types import (
    num_virtual_gates,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def ghz(n):
    c = Circuit(n, n)
    c.h(0)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for q in range(n):
        c.measure(q, q)
    return c


def linear_cz(n, theta=0.7):
    c = Circuit(n, n)
    for q in range(n):
        c.h(q)
    for i in range(n - 1):
        c.cz(i, i + 1)
        c.rz(theta, i)
    for q in range(n):
        c.measure(q, q)
    return c


def oracle_check(orig, virt, tol=1e-4):
    ideal = simulate_circuit(orig)
    knitted, _ = run_virtual_circuit(virt, project=False)
    fid = hellinger_fidelity(ideal, knitted)
    assert fid > 1 - tol, fid
    return fid


def test_optimal_decomposition_pass():
    circ = ghz(6)
    cut = OptimalDecompositionPass(3).run(circ, budget=5)
    assert num_virtual_gates(cut) == 1
    oracle_check(circ, VirtualCircuit(cut))


def test_bisection_pass():
    circ = linear_cz(6)
    cut = BisectionPass(3).run(circ, budget=5)
    assert num_virtual_gates(cut) >= 1
    oracle_check(circ, VirtualCircuit(cut))


def test_optimal_wire_cutter():
    circ = ghz(4)
    cut = OptimalWireCutter(3).run(circ, budget=5)
    assert num_virtual_gates(cut) >= 1
    oracle_check(circ, VirtualCircuit(cut))


def test_cutter_compiler_end_to_end():
    circ = linear_cz(6)
    virt = CutterCompiler(3).run(circ, budget=4)
    assert len(virt.fragments) >= 2
    oracle_check(circ, virt)


def test_greedy_dependency_breaker():
    circ = ghz(5)
    cut = GreedyDependencyBreaker().run(circ, budget=2)
    assert num_virtual_gates(cut) == 2
    oracle_check(circ, VirtualCircuit(cut))


def test_qubit_reuse_identity():
    # cutting ghz-6 at capacity 3 then reusing down to 2 qubits per fragment
    circ = ghz(6)
    cut = OptimalDecompositionPass(3).run(circ, budget=5)
    reused = apply_qubit_reuse(cut, size_to_reach=2, dynamic=False)
    assert max(r.size for r in reused.qregs) <= 3
    oracle_check(circ, VirtualCircuit(reused))


def test_qubit_reuse_dynamic():
    circ = ghz(6)
    cut = OptimalDecompositionPass(3).run(circ, budget=5)
    reused = apply_qubit_reuse(cut, size_to_reach=2, dynamic=True)
    oracle_check(circ, VirtualCircuit(reused))


def test_dag_roundtrip_and_depth():
    circ = ghz(4)
    dag = DAG(circ)
    rt = dag.to_circuit()
    assert rt.count_ops() == circ.count_ops()
    # ghz(4): longest dependency chain h->cx->cx->cx->measure is 5 ops =
    # 4 DAG edges (dag.depth counts edges); dependency count pinned
    assert dag.depth == 4
    assert dag.num_dependencies() == 9


def test_wire_cutter_cuts_through_1q_chains():
    """r3 regression: OptimalWireCutter must insert the cut even when 1q
    gates sit between the consecutive 2q gates the optimiser counted —
    the old version only cut direct DAG edges and silently no-opped."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    circ = Circuit(3, 3)
    circ.h(0)
    circ.cx(0, 1)
    circ.h(1)
    circ.cx(1, 2)
    for q in range(3):
        circ.measure(q, q)
    cut = OptimalWireCutter(2).run(circ, budget=10)
    assert num_virtual_gates(cut) >= 1
    knit, _ = run_virtual_circuit(VirtualCircuit(cut))
    fid = hellinger_fidelity(simulate_circuit(circ), knit)
    assert fid > 1 - 1e-6, fid


def test_depth_counts_condition_clbit():
    """A conditioned gate depends on its condition clbit: qiskit counts
    measure -> c_if chain as depth 2 even on disjoint qubits."""
    circ = Circuit(2, 2)
    circ.measure(0, 0)
    circ.x(1).condition = (0, 1)
    assert circ.depth() == 2


def test_minimizer_uses_correct_node_ids():
    """DAG.copy() renumbers nodes topologically; deps_after must not index
    the copy with original ids (it crashed picking h(0) as a 'vgate')."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.passes import (
        QubitDependencyMinimizer,
    )

    c = Circuit(4, 0)
    c.cx(0, 1)
    c.h(0)
    c.cx(2, 3)
    c.cx(1, 2)
    out = QubitDependencyMinimizer().run(c, budget=1)
    assert num_virtual_gates(out) == 1
    # with one virtualization the only optimal pick is cx(1,2): it joins
    # the two otherwise-independent halves
    dag = DAG(out)
    deps = dag.qubit_dependencies()
    assert all(len(v) <= 1 for v in deps.values()), deps


def test_gate_decomposition_skips_existing_vgates():
    """Re-cutting a circuit that already contains vgates must leave them
    alone (reference's Barrier-subclass skip, gate_decomp.py:128)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.compiler import (
        Pipeline,
    )

    n = 6
    c = Circuit(n, n)
    c.h(0)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for q in range(n):
        c.measure(q, q)
    cut_once = OptimalDecompositionPass(3).run(c, budget=10)
    before = num_virtual_gates(cut_once)
    assert before >= 1
    # second pass over the already-cut circuit: no crash, vgates preserved
    cut_twice = BisectionPass(2).run(cut_once, budget=10)
    assert num_virtual_gates(cut_twice) >= before


def test_genCirc_seed_reproducible():
    """seed= must pin every random branch, including 'ran' and the
    generate_circ families that reseed the module RNG."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )

    def stream(circ):
        return [(i.name, tuple(i.qubits), tuple(i.params or ()))
                for i in circ.instructions]

    for name, n, d in [("ran", 6, 3), ("erd", 5, 1), ("hwe", 5, 1)]:
        a = genCirc(name, n, d, seed=42)
        b = genCirc(name, n, d, seed=42)
        assert stream(a) == stream(b), name
