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
    assert dag.num_dependencies() >= 0
