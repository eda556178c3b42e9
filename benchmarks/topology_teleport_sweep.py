"""ERD + adder sweep: hardware-topology-constrained cuts with teleport
options (BASELINE.json config #5).

Sweeps QAOA-Erdős and ripple-carry-adder circuits over heterogeneous
per-partition capacities (the "device topology" constraint) and over the
teleportation budget: unrestricted (solver picks QPD vs teleport on cost),
and teleport-forced (maxNQpdCuts=0 — every cut must be a teleport, cost
model: S x1, +2 ancilla, +10 latency per cut, Cutter.py:452-471 parity).
Reports S/A/L and the reconstruction fidelity of the QPD plans.

    python benchmarks/topology_teleport_sweep.py
"""
from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    compare_original_with_cut,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E402
    genCirc,
)

SWEEP = [
    # (tag, circ, n, depth, caps, maxNQpdCuts, maxNCuts)
    ("add6_sym", "add", 6, 1, [4, 4], 5, 5),
    ("add6_hetero", "add", 6, 1, [5, 3], 5, 5),
    # teleport-only: QPD cuts forbidden, the split must use teleport cuts
    # (cost model: S x1, +2 ancilla, +10 latency per cut)
    ("ghz8_tele_only", "ghz", 8, 1, [6, 6], 0, 2),
    ("add10_hetero", "add", 10, 1, [9, 5], 5, 5),
    ("qaoa10_sym", "reg", 10, 1, [7, 7], 5, 5),
    ("qaoa10_hetero", "reg", 10, 1, [8, 4], 5, 5),
    ("erd10", "erd", 10, 1, [7, 7], 5, 5),
]


def _gen(name, n, depth):
    return genCirc(name, n, depth)


def main() -> None:
    rows = []
    for tag, name, n, depth, caps, qpd, cuts in SWEEP:
        circ = _gen(name, n, depth)
        cutter = Cutter(
            circ, maxNPartitions=len(caps), maxNQubitsPerPartition=caps,
            maxNQpdCuts=qpd, maxNCuts=cuts, maxCutsPerPartitions=cuts,
        )
        row = {"config": tag, "caps": caps, "maxNQpdCuts": qpd}
        if not cutter.solve():
            row["status"] = "unsat"
            rows.append(row)
            print(json.dumps(row), flush=True)
            continue
        S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
        n_tele = sum(1 for c in cutter.plan.cuts if c.teleport)
        row.update(S=S, A=A, L=L, wire=nW, gate=nG, teleport=n_tele,
                   Q_p=Q_p)
        if n_tele == 0 and S <= 20000:
            res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
            row["fidelity"] = round(res.cut_vs_uncut_fidelity, 8)
        row["status"] = "ok"
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = pathlib.Path("topology_teleport_sweep.json")
    out.write_text(json.dumps(rows, indent=2))


if __name__ == "__main__":
    main()
