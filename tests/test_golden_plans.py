"""Golden regression tests: solver outputs on the reference benchmark set.

The reference publishes no solver-metric goldens (its committed run logs
are rotated tails), so these values are this framework's own recorded
optima (BENCH_TABLE.md) — locked here so solver changes that alter plan
quality are caught.  S is the total sampling overhead (product of
per-cut costs: 6 per gate-QPD, 8 per wire-QPD), the primary optimality
signal after qubit count.
"""
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)

# (circ, n, depth, P, Q) -> (S, n_wire_cuts, n_gate_cuts)
GOLDEN = {
    ("add", 10, 1, 2, 10): (64, 2, 0),
    ("aqft", 10, 1, 2, 10): (13824, 2, 3),
    ("ghz", 24, 1, 2, 12): (6, 0, 1),
    ("hwe", 10, 1, 2, 10): (6, 0, 1),
    ("qft", 10, 1, 2, 10): (1, 0, 0),
    ("sup", 20, 1, 2, 10): (7776, 0, 5),
    ("sup", 25, 1, 2, 13): (10368, 1, 4),
    ("syc", 12, 2, 2, 10): (1, 0, 0),
}


@pytest.mark.parametrize("cfg,want", sorted(GOLDEN.items()))
def test_golden_plan(cfg, want):
    name, n, depth, P, Q = cfg
    circ = genCirc(name, n, depth)
    cutter = Cutter(
        circ, maxNPartitions=P, maxNQubitsPerPartition=Q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve(), cfg
    S, A, L, nW, nG, Qv, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (S, nW, nG) == want, (cfg, (S, nW, nG))
    # capacity constraint honored
    assert all(qp <= Q for qp in Q_p), (cfg, Q_p)
