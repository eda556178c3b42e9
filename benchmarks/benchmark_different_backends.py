"""Heterogeneous-backend benchmark.

Parity with reference benchmarks/benchmark_different_backends.py: partition
capacities come from per-fragment device models (FakeOpenPulse2Q/3Q +
FakeAthens analogs), fragments map 1:1 to those devices, and fidelities are
computed with the uncut circuit on the larger reference device.  (The
reference file uses a stale 4/5-tuple API — SURVEY §7.5; this driver is
written against the current API.)
"""
import datetime
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut_multiple_backends,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    default_noise_model,
    fake_athens,
    fake_open_pulse,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils import (
    artifacts,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (
    configure_loggers,
    get_logger,
)
BACKENDS = [fake_open_pulse(2), fake_open_pulse(3), fake_athens()]
P = len(BACKENDS)
CAPS = [b.num_qubits for b in BACKENDS]
CIRC_NAME, CIRC_N_QUBITS, CIRC_DEPTH = "ghz", 10, 1
if len(sys.argv) == 4:
    CIRC_NAME = sys.argv[1].lower()
    CIRC_N_QUBITS = int(sys.argv[2])
    CIRC_DEPTH = int(sys.argv[3])

run_dir = artifacts.make_run_dir(
    "./benchmark_results", f"multibackend_{CIRC_NAME}_{CIRC_N_QUBITS}"
)
configure_loggers(run_dir / "run.log")
logger = get_logger()

inputCirc = genCirc(CIRC_NAME, CIRC_N_QUBITS, CIRC_DEPTH)
cutter = Cutter(
    inputCirc, maxNPartitions=P, maxNQubitsPerPartition=CAPS, maxNCuts=5
)
start = datetime.datetime.now()
assert cutter.solve(), "unsat"
logger.info(f"solving time elapsed: {datetime.datetime.now() - start}")

decomposed, marked, marked_moves, cutCirc, _ = cutter.getResultCircs()
S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
logger.info(f"S: {S}  Q: {Q}  nWireCuts: {nW}  nGateCuts: {nG}")
for idx, qp in enumerate(Q_p):
    logger.info(f"Q_p{idx}: {qp}")
cutter.logOptimizerResults()
artifacts.save_circuit(decomposed, run_dir, "1_decomposedCirc")
artifacts.save_circuit(marked, run_dir, "2_markedCirc")
artifacts.save_circuit(cutCirc, run_dir, "3_cutCirc")

nShots = 1000
ref_backend = default_noise_model()
logger.info(f"Circuits will be run with {nShots} shots to calculate fidelity...")

# single source of truth for the four-leg comparison (incl. seed hygiene):
# evaluate.compare_original_with_cut_multiple_backends logs the three
# fidelities itself (Utilities.py:230-297 parity)
res = compare_original_with_cut_multiple_backends(
    decomposed, cutCirc, list(BACKENDS), ref_backend, shots=nShots,
)
