"""Solve-once / cut-many: a saved plan applies to re-parameterised
circuits, combining with the parameter-sweep runner."""
import numpy as np

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.plan import (
    CutPlan,
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

N = 5


def _ansatz(thetas):
    circ = Circuit(N, N)
    for q in range(N):
        circ.ry(float(thetas[q]), q)
    for i in range(N - 1):
        circ.cx(i, i + 1)
    for q in range(N):
        circ.measure(q, q)
    return circ


def test_saved_plan_applies_to_new_parameters(tmp_path):
    rng = np.random.default_rng(21)
    cutter0 = Cutter(_ansatz(rng.standard_normal(N)), maxNPartitions=2,
                     maxNQubitsPerPartition=3, maxNQpdCuts=5, maxNCuts=5,
                     maxCutsPerPartitions=5)
    assert cutter0.solve()
    cutter0.save_plan(tmp_path / "plan.json")
    plan = CutPlan.load(tmp_path / "plan.json")

    for _ in range(2):
        circ = _ansatz(rng.standard_normal(N))
        cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
        cutter.use_plan(plan)  # no solve() call
        cut = cutter.getResultCircs()[3]
        dist, _ = run_virtual_circuit(VirtualCircuit(cut), project=False)
        fid = hellinger_fidelity(simulate_circuit(circ), dist)
        assert fid > 1 - 1e-5, fid
        assert cutter.getModelKeyResults()[0] == plan.metrics.S
