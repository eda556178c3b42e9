"""Heuristic-compiler demo: cut an EfficientSU2 ansatz into <=4-qubit
fragments with the CutterCompiler pipeline, run every QPD variant in one
batched launch, knit, and score against the uncut circuit.

Capability parity with third_party/qvm/examples/simple.py:10-24.
"""
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from fid import calculate_fidelity  # noqa: E402

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.compiler import (  # noqa: E402
    CutterCompiler,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.su2 import (  # noqa: E402
    efficient_su2,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)


def main() -> None:
    rng = np.random.default_rng(7)
    circuit = efficient_su2(
        8, entanglement="linear", reps=2,
        params=(rng.standard_normal(2 * 8 * 3) / 2).tolist(),
    )
    circuit.measure_all()
    print(circuit)

    compiler = CutterCompiler(size_to_reach=4)
    virtual_circuit = compiler.run(circuit, budget=2)
    for reg in virtual_circuit.fragments:
        print(f"fragment {reg.name}: "
              f"{virtual_circuit.programs[reg.name].num_data_qubits} qubits")

    result, info = run_virtual_circuit(virtual_circuit, shots=10000)
    print(f"run {info.run_time:.2f}s knit {info.knit_time:.2f}s")
    print("fidelity:", calculate_fidelity(circuit, result))


if __name__ == "__main__":
    main()
