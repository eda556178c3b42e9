"""CNOT-count and depth benchmark.

Parity with reference benchmarks/benchmark_number_of_cnots_and_depth.py:
compares (input, transpiled input, transpiled fragments / instantiations) on
CNOT count and depth, with qiskit's backend transpile replaced by the
first-party basis transpiler (circuit/transpile.py).
"""
import datetime
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.transpile import (
    count_cnots,
    transpile_to_basis,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
    generate_instantiation_circuits,
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)

P, Q, NAME, NQ, DEPTH = 2, 10, "ghz", 5, 1
if len(sys.argv) == 8 and sys.argv[1] == "-p" and sys.argv[3] == "-q":
    P, Q = int(sys.argv[2]), int(sys.argv[4])
    NAME, NQ, DEPTH = sys.argv[5].lower(), int(sys.argv[6]), int(sys.argv[7])

run_dir = artifacts.make_run_dir(
    "./benchmark_results", f"cnots_{NAME}_{NQ}_{DEPTH}_{P}_{Q}"
)
configure_loggers(run_dir / "run.log")
logger = get_logger()

inputCirc = genCirc(NAME, NQ, DEPTH)
cutter = Cutter(
    inputCirc, maxNPartitions=P, maxNQubitsPerPartition=Q,
    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
)
assert cutter.solve()
_, _, _, cutCirc, _ = cutter.getResultCircs()


def params(c):
    return count_cnots(c), c.depth()


nCnots, depth = params(inputCirc)
logger.info(f"PARAM == inputCirc => nCnots: {nCnots}; depth: {depth}")

t_input = transpile_to_basis(inputCirc)
nCnots, depth = params(t_input)
logger.info(f"PARAM == transpiledInputCirc => nCnots: {nCnots}; depth: {depth}")

virt = VirtualCircuit(cutCirc.copy())
insts = generate_instantiation_circuits(virt)
sum_cnots, depths = 0, set()
for idx, variants in enumerate(insts):
    # the reference transpiles ONE circuit per fragment (the fragment
    # circuit itself, benchmark_number_of_cnots_and_depth.py:84-90), not
    # every instantiation — variant 0 is that representative here
    frag_cnots, frag_depth = 0, 0
    try:
        t = transpile_to_basis(variants[0])
        frag_cnots, frag_depth = params(t)
    except (KeyError, NotImplementedError):
        pass
    logger.info(
        f"PARAM == transpiledFrag[{idx}] => nCnots: {frag_cnots}; "
        f"depth: {frag_depth}"
    )
    sum_cnots += frag_cnots
    depths.add(frag_depth)

logger.info(
    f"PARAM == cut summary => sumNCnots: {sum_cnots}; "
    f"maxDepth: {max(depths) if depths else 0}"
)
