"""qft-16 cuttability boundary — the recorded artifact (r2 VERDICT #9).

BASELINE.json names qft-16 as a north-star config, but at the reference's
own CLI defaults (P=2, maxNQpdCuts=5) the cut-search problem is
*infeasible*, and not marginally so:

  * QFT-16's interaction graph is the complete graph K16 — every qubit
    pair shares at least one cp gate (verified below from the cut graph),
    so ANY bipartition with a<=15 qubits on one side crosses at least
    a*(16-a) >= 15 gate-cut candidate edges;
  * the minimum possible cut set is therefore 15 QPD cuts (the 15|1
    split), with sampling overhead S >= 6^15 ~ 4.7e11 — thirteen orders
    of magnitude beyond the 5-cut budget's 6^5=7776, for a circuit whose
    full 2^16-amplitude statevector simulates in milliseconds;
  * the solver proves unsat for budgets 5 (0.1 s each, caps 10..15) and
    8 (12.5 s at Q=15) by exhaustion.

This script regenerates `qft16_boundary.json` with the unsat grid and the
pair-coverage proof of the analytic bound.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.graph import (
    GATE,
    read_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)


def pair_coverage(n: int = 16) -> dict:
    """Verify K_n: every qubit pair shares >= 1 gate-cut candidate edge."""
    g = read_circuit(genCirc("qft", n, 1).copy().decompose())
    pairs = set()
    for (u, v, k) in g.edges:
        if k == GATE:
            pairs.add(tuple(sorted(
                (g.vertices[u].qubit, g.vertices[v].qubit)
            )))
    want = {(i, j) for i in range(n) for j in range(i + 1, n)}
    return {
        "vertices": g.num_vertices,
        "gate_edges": len([e for e in g.edges if e[2] == GATE]),
        "qubit_pairs_covered": len(pairs),
        "complete_graph": pairs == want,
        "min_crossing_any_bipartition": min(
            a * (n - a) for a in range(1, n)
        ),
    }


def unsat_grid() -> list[dict]:
    out = []
    for Q, B in ((15, 5), (14, 5), (12, 5), (10, 5), (15, 8)):
        t0 = time.time()
        cutter = Cutter(
            genCirc("qft", 16, 1), maxNPartitions=2,
            maxNQubitsPerPartition=Q,
            maxNQpdCuts=B, maxNCuts=B, maxCutsPerPartitions=B,
        )
        ok = cutter.solve()
        out.append({
            "Q": Q, "budget": B,
            "sat": bool(ok), "solve_s": round(time.time() - t0, 2),
        })
    return out


def main():
    cov = pair_coverage()
    grid = unsat_grid()
    artifact = {
        "claim": (
            "qft-16 at the reference CLI defaults (P2, budget 5) is "
            "infeasible; the minimum cut set is 15 QPD cuts (S >= 6^15)"
        ),
        "pair_coverage": cov,
        "analytic_lower_bound_cuts": 15,
        "analytic_lower_bound_S": 6 ** 15,
        "unsat_grid": grid,
        "boundary_sat_example": {
            "description": (
                "the 15|1 split cuts exactly the 15 cp gates touching "
                "the lone qubit; wire edges stay internal, so budget 15 "
                "is sufficient as well as necessary"
            ),
            "cuts": 15,
            "S": 6 ** 15,
        },
    }
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "qft16_boundary.json"
    )
    path.write_text(json.dumps(artifact, indent=2))
    print(json.dumps(artifact["pair_coverage"]))
    for row in grid:
        print(row)


if __name__ == "__main__":
    main()
