"""Wire-cutting demo: split a 12-qubit GHZ chain with the optimal wire
cutter (2 cut budget, <=4-qubit target fragments), execute, knit, score.

Capability parity with third_party/qvm/examples/wire_cut.py:20-37.
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from fid import calculate_fidelity  # noqa: E402

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.passes import (  # noqa: E402
    OptimalWireCutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)


def main() -> None:
    circuit = Circuit(12, 12)
    circuit.h(0)
    for i in range(1, 12):
        circuit.cx(i - 1, i)
    circuit.measure_all()
    print(circuit)

    original = circuit.copy()
    # a 12-qubit chain into <=4-qubit fragments needs 4 fragments, i.e. 3
    # wire cuts (the reference demo's budget of 2 is infeasible and that
    # script does not run as-is — SURVEY §7.5)
    cut_circuit = OptimalWireCutter(4).run(circuit, budget=3)
    print(cut_circuit)

    virt = VirtualCircuit(cut_circuit)
    result, info = run_virtual_circuit(virt, shots=10000)
    print(f"run {info.run_time:.2f}s knit {info.knit_time:.2f}s")
    print("fidelity:", calculate_fidelity(original, result))


if __name__ == "__main__":
    main()
