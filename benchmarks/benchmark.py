"""Main benchmark CLI.

Usage parity with the reference (benchmarks/benchmark.py:22-29):

    python benchmarks/benchmark.py -p 2 -q 10 \
        [ran|sup|su|ghz|syc|hwe|bv|qft|aqft|add|erd] <nQubits> <nDepth>

Flow: generate -> Cutter(maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
-> solve -> artifacts (+ cut plan JSON) -> optional fidelity run
(CUT_ONLY=True by default skips simulation, reference benchmark.py:20).
"""
import datetime
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils import (
    artifacts,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (
    configure_loggers,
    get_logger,
)

BENCHMARK_MAX_PARTITIONS = 2
BENCHMARK_MAX_N_QUBITS = 10
CIRC_NAME = "ghz"
CIRC_N_QUBITS = 5
CIRC_DEPTH = 1
CUT_ONLY = True  # don't do fidelity comparison (reference default)

if len(sys.argv) == 8 and sys.argv[1] == "-p" and sys.argv[3] == "-q":
    BENCHMARK_MAX_PARTITIONS = int(sys.argv[2])
    BENCHMARK_MAX_N_QUBITS = int(sys.argv[4])
    CIRC_NAME = str(sys.argv[5]).lower()
    CIRC_N_QUBITS = int(sys.argv[6])
    CIRC_DEPTH = int(sys.argv[7])

tag = (
    f"{CIRC_NAME}_{CIRC_N_QUBITS}_{CIRC_DEPTH}_"
    f"{BENCHMARK_MAX_PARTITIONS}_{BENCHMARK_MAX_N_QUBITS}"
)
run_dir = artifacts.make_run_dir("./benchmark_results", tag)
configure_loggers(run_dir / "run.log")
logger = get_logger()

inputCirc = genCirc(CIRC_NAME, CIRC_N_QUBITS, CIRC_DEPTH)

cutter = Cutter(
    inputCirc=inputCirc,
    maxNPartitions=BENCHMARK_MAX_PARTITIONS,
    maxNQubitsPerPartition=BENCHMARK_MAX_N_QUBITS,
    forceNWireCuts=None,
    forceNGateCuts=None,
    maxNQpdCuts=5,
    maxNCuts=5,
    maxCutsPerPartitions=5,
)

startTime = datetime.datetime.now()
logger.info("solving STARTED")
success = cutter.solve()
endTime = datetime.datetime.now()
logger.info("solving DONE")
logger.info(f"solving time elapsed: {endTime - startTime}")
logger.info(f"success => {success}")

if not success:
    sys.exit(0)

decomposedCirc, markedCirc, markedCircWithVirtualMoves, cutCirc, insts = (
    cutter.getResultCircs(getInstantiations=True)
)
S, A, L, nWireCuts, nGateCuts, Q, Q_pArr, C, C_pArr = (
    cutter.getModelKeyResults()
)

logger.info(f"S: {S}")
logger.info(f"A: {A}")
logger.info(f"L: {L}")
logger.info(f"Q: {Q}")
logger.info(f"C: {C}")
logger.info(f"nWireCuts: {nWireCuts}")
logger.info(f"nGateCuts: {nGateCuts}")
for idx in range(BENCHMARK_MAX_PARTITIONS):
    logger.info(f"  Q_p{idx}: {Q_pArr[idx]}")
for idx in range(BENCHMARK_MAX_PARTITIONS):
    logger.info(f"  C_p{idx}: {C_pArr[idx]}")
cutter.logOptimizerResults()

artifacts.save_circuit(decomposedCirc, run_dir, "1_decomposedCirc")
artifacts.save_circuit(markedCirc, run_dir, "2_markedCirc")
artifacts.save_circuit(
    markedCircWithVirtualMoves, run_dir, "3_markedCircWithVirtualMoves"
)
artifacts.save_circuit(cutCirc, run_dir, "4_cutCirc")
cutter.save_plan(run_dir / "cut_plan.json")
artifacts.save_metrics(
    run_dir,
    {
        "S": S, "A": A, "L": L, "Q": Q, "C": C,
        "nWireCuts": nWireCuts, "nGateCuts": nGateCuts,
        "Q_p": Q_pArr, "C_p": C_pArr,
        "solve_seconds": (endTime - startTime).total_seconds(),
    },
)

count = 0
for fIdx, inst in enumerate(insts):
    for cIdx, c in enumerate(inst):
        artifacts.save_circuit(c, run_dir / "instantiations", f"{fIdx}_{cIdx}")
        count += 1
logger.info(f"{count} instantiations are saved to disk")

if CUT_ONLY:
    logger.info("CUT_ONLY == True => Simulation will not run.")
    sys.exit(0)

nShots = 1000
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    default_noise_model,
)

res = compare_original_with_cut(
    decomposedCirc, cutCirc, noise_model=default_noise_model(), shots=nShots
)
logger.info(f"inputCircFidelity: {res.input_fidelity}")
logger.info(f"cutCircFidelity: {res.cut_fidelity}")
logger.info(f"cutVsUncutFidelity: {res.cut_vs_uncut_fidelity}")
