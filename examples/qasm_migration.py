"""Migrating an existing qiskit circuit via OpenQASM 2.0.

A reference user's circuits are qiskit QuantumCircuits; ``qc.qasm()``
(qiskit 0.44, the reference's pin) dumps OpenQASM 2.0, which
``circuit.qasm.from_qasm`` imports directly — including file-local
``gate`` definitions, register broadcast and 1-bit ``if (c==v)``.
Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/qasm_migration.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.qasm import (
    from_qasm,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
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

# what `qc.qasm()` produces for a 6-qubit GHZ with a custom sub-gate
QASM = """
OPENQASM 2.0;
include "qelib1.inc";
gate pair a,b { h a; cx a,b; }
qreg q[6];
creg c[6];
pair q[0],q[1];
cx q[1],q[2];
cx q[2],q[3];
cx q[3],q[4];
cx q[4],q[5];
measure q -> c;
"""

circ = from_qasm(QASM)
cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                maxNQpdCuts=3, maxNCuts=3, maxCutsPerPartitions=3)
assert cutter.solve(), "unsat"
_, _, _, cut_circ, _ = cutter.getResultCircs()
knitted, info = run_virtual_circuit(VirtualCircuit(cut_circ))
fid = hellinger_fidelity(simulate_circuit(circ), knitted)
print(f"imported {circ.num_qubits}q circuit, cut+knit fidelity: {fid:.8f}")
assert fid > 1 - 1e-5
