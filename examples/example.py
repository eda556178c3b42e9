"""Minimal end-to-end example (parity with reference examples/example.py,
written against the current API — the reference file itself uses stale
kwargs, SURVEY §7.5)."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import Cutter
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    default_noise_model,
)

circ = Circuit(3, 3)
circ.cx(0, 1)
circ.cx(0, 2)
circ.h(0)
circ.cx(0, 1)
circ.cx(1, 2)
circ.cx(0, 1)
circ.measure_all()

cutter = Cutter(
    circ, maxNPartitions=2, maxNQubitsPerPartition=10,
    forceNWireCuts=1, forceNGateCuts=2,
)

n_solutions = 0
while cutter.solve() and n_solutions < 3:
    n_solutions += 1
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    print(f"solution {n_solutions}: S={S} A={A} L={L} Q={Q} "
          f"cuts={nW}w+{nG}g")
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    res = compare_original_with_cut(
        circ, cut_circ, noise_model=default_noise_model(), shots=1000
    )
    print(f"  fidelities: input={res.input_fidelity:.4f} "
          f"cut={res.cut_fidelity:.4f} "
          f"cutVsUncut={res.cut_vs_uncut_fidelity:.4f}")
