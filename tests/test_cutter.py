"""End-to-end cutter pipeline tests: solve -> rewrite -> fragment ->
simulate -> knit -> fidelity oracle (reference flow: benchmark.py:39-103)."""
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.solver import (  # noqa: E402
    plan_signature,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut,
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


def ghz(n):
    c = Circuit(n, n)
    c.h(0)
    for i in range(n - 1):
        c.cx(i, i + 1)
    for q in range(n):
        c.measure(q, q)
    return c


def check_pipeline(circ, cutter, min_fid=1 - 1e-5, exact=True):
    assert cutter.solve()
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    ideal = simulate_circuit(circ)
    knitted, _ = run_virtual_circuit(
        VirtualCircuit(cut_circ), project=not exact
    )
    fid = hellinger_fidelity(ideal, knitted)
    assert fid > min_fid, f"fidelity {fid}"
    return cutter


def test_ghz5_forced_wire_cut():
    circ = ghz(5)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=4,
        forceNWireCuts=1, forceNGateCuts=0, maxNCuts=2,
    )
    check_pipeline(circ, cutter)
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert nW == 1 and nG == 0
    assert S == 8          # one wire QPD cut
    assert A == 8          # 1 ancilla * S
    assert L == 0
    assert Q == 3          # 5 qubits split 2/3... plus cut wire: max Q_p
    assert sorted(Q_p) == [3, 3]  # wire-cut target partition counts +1


def test_ghz4_gate_cut():
    circ = ghz(4)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=2,
        forceNWireCuts=0, forceNGateCuts=1, maxNCuts=1,
    )
    check_pipeline(circ, cutter)
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (nW, nG) == (0, 1)
    assert S == 6
    assert A == 0
    assert Q == 2


def test_ghz5_free_choice_prefers_gate_cut():
    # gate cuts cost S=6 < wire 8 and 0 ancilla; with capacity 3 the solver
    # should pick a single gate cut
    circ = ghz(5)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=3,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    check_pipeline(circ, cutter)
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (nW, nG) == (0, 1)
    assert S == 6 and Q == 3 and C == 1


def test_unsat_returns_false():
    circ = ghz(4)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=2,
        forceNWireCuts=0, forceNGateCuts=0, maxNCuts=1,
    )
    assert cutter.solve() is False


def test_repeat_solve_enumerates_other_solutions():
    circ = ghz(4)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=3,
        maxNCuts=1,
    )
    seen = set()
    count = 0
    while cutter.solve() and count < 5:
        seen.add(plan_signature(cutter.plan))
        count += 1
    assert count >= 2
    # every enumerated plan is distinct by FULL signature (assignment +
    # cut set + teleport mask) — since r3 the within-leaf alternatives
    # (same assignment, different cuts) enumerate too
    assert len(seen) == count


def test_mixed_circuit_with_cp_rzz():
    c = Circuit(4, 4)
    c.h(0)
    c.cx(0, 1)
    c.cp(0.9, 1, 2)
    c.rzz(1.1, 2, 3)
    c.h(3)
    for q in range(4):
        c.measure(q, q)
    cutter = Cutter(
        c, maxNPartitions=2, maxNQubitsPerPartition=2,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    check_pipeline(c, cutter)


def test_compare_harness():
    circ = ghz(4)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=3, maxNCuts=2,
        maxNQpdCuts=2,
    )
    assert cutter.solve()
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    res = compare_original_with_cut(circ, cut_circ)
    assert res.cut_vs_uncut_fidelity > 1 - 1e-5
    assert res.input_fidelity == pytest.approx(1.0, abs=1e-6)


def test_plan_roundtrip(tmp_path):
    circ = ghz(4)
    cutter = Cutter(circ, 2, 3, maxNCuts=2, maxNQpdCuts=2)
    assert cutter.solve()
    p = tmp_path / "plan.json"
    cutter.save_plan(p)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.plan import (
        CutPlan,
    )
    plan2 = CutPlan.load(p)
    assert plan2.assignment == cutter.plan.assignment
    assert plan2.metrics.S == cutter.plan.metrics.S


def test_cost_model_knob_propagates():
    """utils.config.CostModel reaches the solver: a custom gate-QPD
    overhead shows up in the chosen plan's S (the lexicographic order
    still puts Q first, so the CHOICE may not flip — reference
    objective order, Cutter.py:567-571)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.config import (
        CostModel,
        CutterConfig,
        make_cutter,
    )

    circ = Circuit(4, 4)
    circ.h(0)
    for i in range(3):
        circ.cx(i, i + 1)
    for q in range(4):
        circ.measure(q, q)
    cm = CostModel(gate_qpd_overhead=100)
    cutter = make_cutter(circ, CutterConfig(
        max_n_partitions=2, max_n_qubits_per_partition=2, cost_model=cm,
    ))
    assert cutter.cfg.gate_qpd_cost == (100, 0, 0)
    assert cutter.solve()
    assert cutter.plan.metrics.n_gate_cuts == 1
    assert cutter.plan.metrics.S == 100  # custom table, not the default 6


# ---------------------------------------------------------------------------
# spare-capacity constraint: wire cuts need a free slot for their vmove qubit
# ---------------------------------------------------------------------------

def _spare_regression_circ():
    """6 qubits, qubit 0 gate-less (stress seed 1009): with caps [3, 3]
    every slot is taken by original qubits, so any wire-cut plan is
    fragment-infeasible.  The reference's z3 model misses this and dies in
    _getFragments with "not enough available spots" (Cutter.py:684)."""
    c = Circuit(6, 6)
    c.cx(1, 2)
    c.swap(1, 5)
    c.cz(3, 5)
    c.z(1)
    c.sdg(0)
    c.cx(5, 4)
    c.t(2)
    for q in range(6):
        c.measure(q, q)
    return c


def test_zero_spare_capacity_avoids_wire_cuts():
    circ = _spare_regression_circ()
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    check_pipeline(circ, cutter)  # must not raise in getResultCircs
    assert cutter.plan.metrics.n_wire_cuts == 0


def test_zero_spare_capacity_forced_wire_cut_is_unsat():
    circ = _spare_regression_circ()
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    forceNWireCuts=1, maxNQpdCuts=5, maxNCuts=5,
                    maxCutsPerPartitions=5)
    assert not cutter.solve()  # infeasible up front, not a rewrite crash


def test_one_spare_slot_allows_one_wire_cut():
    circ = _spare_regression_circ()
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=[4, 3],
                    forceNWireCuts=1, maxNQpdCuts=5, maxNCuts=5,
                    maxCutsPerPartitions=5)
    check_pipeline(circ, cutter)
    assert cutter.plan.metrics.n_wire_cuts == 1


def test_invalid_configs_raise_value_error():
    circ = ghz(4)
    with pytest.raises(ValueError, match="hold only"):
        Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=1)
    with pytest.raises(ValueError, match="cut-graph vertices"):
        Cutter(ghz(2), maxNPartitions=3, maxNQubitsPerPartition=2)
    with pytest.raises(ValueError, match="forceNWireCuts"):
        Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
               forceNWireCuts=-1)
    with pytest.raises(ValueError, match="below the forced"):
        Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
               forceNGateCuts=3, maxNCuts=2)
    with pytest.raises(ValueError, match="exceeds maxNCuts"):
        Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
               maxNCuts=2, maxNQpdCuts=3)
