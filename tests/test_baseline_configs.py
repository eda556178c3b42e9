"""BASELINE.json north-star configs as executable regressions.

Config #1 (BV-5 single wire cut) runs exactly; the bigger configs lock
their full-scale *plan metrics* (solve is fast) and prove *fidelity* on a
CPU-scale variant of the same family/cut structure (r2 VERDICT item 6).
"""
import json
import pathlib

import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)


def test_bv5_single_wire_cut_exact():
    circ = genCirc("bv", 5, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=10,
        forceNWireCuts=1, forceNGateCuts=0, maxNCuts=1,
    )
    assert cutter.solve()
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (nW, nG) == (1, 0)
    assert S == 8  # one wire QPD cut = 8x sampling overhead
    res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
    assert res.cut_vs_uncut_fidelity > 1 - 1e-5


def _solve(name, n, d, P, Q, **kw):
    circ = genCirc(name, n, d)
    cutter = Cutter(
        circ, maxNPartitions=P, maxNQubitsPerPartition=Q,
        maxNQpdCuts=kw.get("maxNQpdCuts", 5),
        maxNCuts=kw.get("maxNCuts", 5),
        maxCutsPerPartitions=kw.get("maxCutsPerPartitions", 5),
    )
    assert cutter.solve(), (name, n, d, P, Q)
    return circ, cutter


def test_aqft16_plan_metrics():
    """Config #2 (AQFT-16 mixed wire+gate cuts): full-scale plan locked."""
    _, cutter = _solve("aqft", 16, 1, 2, 10)
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (S, nW, nG, Q) == (24576, 4, 1, 10)  # 8^4 * 6: mixed cut set
    assert all(qp <= 10 for qp in Q_p)


def test_aqft_family_fidelity_cpu_scale():
    """Config #2 execution at CPU scale: aqft-6 d2, full variant batch in
    one launch, knitted fidelity ~1."""
    circ, cutter = _solve("aqft", 6, 2, 2, 5)
    res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
    assert res.cut_vs_uncut_fidelity > 1 - 1e-5


def test_qft16_boundary_artifact():
    """Config #2's qft-16 twin is infeasible at the reference defaults —
    locked via the committed artifact + a live unsat check (r2 VERDICT
    item 9; see benchmarks/qft16_boundary.py)."""
    art = json.loads(
        (pathlib.Path(__file__).parent.parent / "qft16_boundary.json")
        .read_text()
    )
    assert art["pair_coverage"]["complete_graph"] is True
    assert art["analytic_lower_bound_cuts"] == 15
    assert all(not row["sat"] for row in art["unsat_grid"])
    # live: the Q=15 budget-5 unsat proof is fast
    circ = genCirc("qft", 16, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=15,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve() is False


def test_hwe16_d5_plan_metrics():
    """Config #3 (HWE-16 depth-5): 5 gate cuts, gamma overhead S=6^5."""
    _, cutter = _solve("hwe", 16, 5, 2, 10)
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (S, nW, nG) == (7776, 0, 5)
    assert S == 6 ** 5  # gamma-overhead accounting: product of per-cut 6s


def test_hwe16_family_fidelity_cpu_scale():
    """Config #3 execution at CPU scale: hwe-16 d2 (same family, 2 cuts,
    36 labels) knits to fidelity ~1."""
    circ, cutter = _solve("hwe", 16, 2, 2, 10)
    res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
    assert res.cut_vs_uncut_fidelity > 1 - 1e-5


def test_syc32_marginal_knit():
    """Config #4 (sycamore-32): fragments of 18 and 14 sim qubits; the
    full 2^32 distribution never materialises — knit an exact 8-clbit
    marginal and check it against the lightcone oracle."""
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
        lightcone_marginal,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
        knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        run_all_fragments,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    circ, cutter = _solve("syc", 32, 1, 2, 20)
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert nW + nG == 0  # depth-1 sycamore splits clean at P2 Q20
    cut = cutter.getResultCircs()[3]
    virt = VirtualCircuit(cut)
    sizes = sorted(p.num_sim_qubits for p in virt.programs.values())
    assert sizes[-1] >= 18  # beyond-20q-chip-class fragment

    keep = set(range(8))
    results = run_all_fragments(virt)
    marg = knit(virt, results, keep_clbits=keep)
    oracle = lightcone_marginal(circ, keep)
    assert marg.bit_positions == oracle.bit_positions
    err = float(np.max(np.abs(
        np.asarray(marg.values) - np.asarray(oracle.values)
    )))
    assert err < 1e-5, err


def test_add6_topology_teleport_sweep_artifact():
    """Config #5: the recorded topology/teleport sweep artifact holds the
    locked plan metrics; re-run the symmetric + teleport points live."""
    art = json.loads(
        (pathlib.Path(__file__).parent.parent /
         "topology_teleport_sweep.json").read_text()
    )["rows"]
    rows = {r["config"]: r for r in art}
    assert rows["add6_sym"]["S"] == 64 and rows["add6_sym"]["wire"] == 2
    # r5 (VERDICT r4 #7): EVERY ok row carries an executed fidelity —
    # teleport rows included — plus the S/A/L accounting assertion and
    # the execution-path note
    for r in art:
        if r["status"] != "ok":
            continue
        assert "fidelity" in r, r
        assert r["fidelity"] > 1 - 1e-4, r
        if "S" in r:
            assert r.get("accounting_ok") is True, r
            assert "executed_via" in r, r
    tele = rows["ghz8_tele_only"]
    assert tele["teleport"] >= 1
    assert "teleport protocol" in tele["executed_via"]

    circ = genCirc("add", 6, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=[4, 4],
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert S == 64 and (nW, nG) == (2, 0)
    res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
    assert res.cut_vs_uncut_fidelity > 1 - 1e-4


def test_erd_family_fidelity():
    """Config #5's ERD leg: a QAOA-Erdos circuit cut end-to-end."""
    circ = genCirc("erd", 8, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=5,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
    assert res.cut_vs_uncut_fidelity > 1 - 1e-4
