"""ERD + adder sweep: hardware-topology-constrained cuts with teleport
options (BASELINE.json config #5; regenerated r5 per VERDICT r4 #7).

Sweeps QAOA-Erdős and ripple-carry-adder circuits over heterogeneous
per-partition capacities (the "device topology" constraint) and over the
teleportation budget: unrestricted (solver picks QPD vs teleport on
cost), and teleport-forced (maxNQpdCuts=0 — every cut must be a
teleport; cost model: S x1, +2 ancilla, +10 latency per cut,
Cutter.py:452-471 parity).

Every ``status: ok`` row carries an EXECUTED fidelity: QPD plans run
through the standard knit; teleport plans run through the real
EPR-gadget protocol (``run_virtual_circuit(teleport="execute")``,
virt/teleport.py — the capability the reference only prices,
Cutter.py:574 FIXME), and each row records which path executed it plus
an ``accounting_ok`` flag asserting the reported S/A/L against the
plan's cut list and the reference cost table.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \\
        python benchmarks/topology_teleport_sweep.py
    python benchmarks/topology_teleport_sweep.py --tpu-leg   # adds a
        real-device teleport-execution leg (median of 3, load proxy)
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E402
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    simulate_circuit_host,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

SWEEP = [
    # (tag, circ, n, depth, caps, maxNQpdCuts, maxNCuts)
    ("add6_sym", "add", 6, 1, [4, 4], 5, 5),
    ("add6_hetero", "add", 6, 1, [5, 3], 5, 5),
    # teleport-only: QPD cuts forbidden, the split must use teleport cuts
    ("ghz8_tele_only", "ghz", 8, 1, [6, 6], 0, 2),
    ("add10_hetero", "add", 10, 1, [9, 5], 5, 5),
    ("qaoa10_sym", "reg", 10, 1, [7, 7], 5, 5),
    ("qaoa10_hetero", "reg", 10, 1, [8, 4], 5, 5),
    ("erd10", "erd", 10, 1, [7, 7], 5, 5),
]

# reference cost table (Cutter.py:452-471): (S multiplier, ancilla, lat)
COSTS = {("gate", False): (6, 0, 0), ("wire", False): (8, 1, 0),
         ("gate", True): (1, 2, 10), ("wire", True): (1, 2, 10)}


def _accounting_ok(plan, S, A, L) -> bool:
    """Re-derive S/A/L from the cut list + the reference cost table and
    compare with the reported metrics (VERDICT r4 #7: assert, don't
    trust)."""
    s = 1
    anc = 0
    lat = 0
    for c in plan.cuts:
        mult, a, lt = COSTS[(c.kind, bool(c.teleport))]
        s *= mult
        anc += a
        lat += lt
    return s == S and anc * s == A and lat == L


def _executed_fidelity(circ, cut_circ, teleport: str):
    virt = VirtualCircuit(cut_circ)
    dist, _ = run_virtual_circuit(virt, teleport=teleport)
    return float(hellinger_fidelity(simulate_circuit_host(circ), dist))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu-leg", action="store_true",
                    help="additionally run the teleport-executed ghz8 "
                         "leg on the default (TPU) backend, median of 3")
    ap.add_argument("--out", default="topology_teleport_sweep.json")
    args = ap.parse_args()

    import jax

    device = str(jax.devices()[0])
    rows = []
    for tag, name, n, depth, caps, qpd, cuts in SWEEP:
        # seed pinned: the reg/erd families are random graphs — an
        # unseeded row is not reproducible (r5 measurement hygiene)
        circ = genCirc(name, n, depth, seed=7)
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
                   Q_p=Q_p,
                   accounting_ok=_accounting_ok(cutter.plan, S, A, L))
        cut_circ = cutter.getResultCircs()[3]
        mode = "execute" if n_tele else "qpd"
        row["executed_via"] = (
            "teleport protocol (virt/teleport.py EPR gadgets; fragments "
            "merge across the quantum channel)" if n_tele
            else "qpd knit"
        )
        row["fidelity"] = round(
            _executed_fidelity(circ, cut_circ, mode), 8
        )
        row["status"] = "ok"
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.tpu_leg:
        # real-device teleport-execution leg (measurement-hygiene policy:
        # load proxy + median of 3 steady repeats)
        import jax.numpy as jnp

        t = time.perf_counter()
        jnp.zeros((8,)).block_until_ready()
        init_s = time.perf_counter() - t
        tag, name, n, depth, caps, qpd, cuts = SWEEP[2]
        circ = genCirc(name, n, depth, seed=7)
        cutter = Cutter(circ, maxNPartitions=2,
                        maxNQubitsPerPartition=caps,
                        maxNQpdCuts=qpd, maxNCuts=cuts,
                        maxCutsPerPartitions=cuts)
        assert cutter.solve()
        cut_circ = cutter.getResultCircs()[3]
        reps = []
        fid = None
        for _ in range(3):
            t = time.perf_counter()
            fid = _executed_fidelity(circ, cut_circ, "execute")
            reps.append(round(time.perf_counter() - t, 3))
        rows.append({
            "config": f"{tag}_tpu_leg",
            "device": device,
            "load_proxy_first_dispatch_s": round(init_s, 3),
            "executed_via": "teleport protocol on device",
            "fidelity": round(fid, 8),
            "reps_s": reps,
            "median_s": sorted(reps)[1],
            "status": "ok",
        })
        print(json.dumps(rows[-1]), flush=True)

    meta = {"device": device,
            "generated": "r5 (teleport cuts EXECUTED, not just priced)"}
    pathlib.Path(args.out).write_text(
        json.dumps({"meta": meta, "rows": rows}, indent=2)
    )


if __name__ == "__main__":
    main()
