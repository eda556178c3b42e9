"""Angle-aware (gamma-mode) cut search — cutter/gamma.py.

Locks VERDICT r3 action #1: the solver objective is the TRUE QPD 1-norm
product (gamma(cp(theta)) -> 1 as theta -> 0) instead of the reference's
flat 6/8 multipliers (/root/reference/src/HwAwareCutter/Cutter.py:452-471
vs /root/reference/third_party/qvm/qvm/virtual_gates.py:262-291), and the
solved plan feeds the sampled engine end-to-end (qft-8-scale twin of the
qft-16 TPU delivery, benchmarks/qft16_sampled.py).
"""
import math

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.gamma import (
    gamma_of_edge,
    gamma_of_spec,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.graph import (
    read_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qft import (
    library_qft,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.tables import (
    spec_for,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _qft_gamma_analytic(n: int) -> float:
    """gamma_total of the n-1 cp cuts isolating an end qubit of qft-n:
    gamma(cp(theta)) = 1 + 2|sin(theta/2)| with theta = pi/2^d."""
    return math.prod(
        1 + 2 * math.sin(math.pi / 2 ** (d + 1)) for d in range(1, n)
    )


def test_gamma_of_spec_values():
    assert gamma_of_spec(spec_for("cz")) == pytest.approx(3.0)
    assert gamma_of_spec(spec_for("cx")) == pytest.approx(3.0)
    assert gamma_of_spec(spec_for("cy")) == pytest.approx(3.0)
    assert gamma_of_spec(spec_for("move")) == pytest.approx(4.0)
    for theta in (math.pi / 2, math.pi / 8, 0.3):
        assert gamma_of_spec(spec_for("cp", (theta,))) == pytest.approx(
            1 + 2 * abs(math.sin(theta / 2))
        )
        # rzz(theta) = exp(-i theta/2 ZZ): gamma = 1 + 2|sin(theta)|
        # (the Piveteau-Sutter optimal for exp(i alpha ZZ) is
        # 1 + 2|sin(2 alpha)|; cp(theta) ~ rzz(-theta/2) + local frames,
        # hence its 1 + 2|sin(theta/2)| above)
        assert gamma_of_spec(spec_for("rzz", (theta,))) == pytest.approx(
            1 + 2 * abs(math.sin(theta))
        )


def test_gamma_of_edge_kinds():
    c = Circuit(3, 0)
    c.cp(math.pi / 4, 0, 1)
    c.cx(1, 2)
    g = read_circuit(c)
    gate_edges = [i for i, e in enumerate(g.edges) if e[2] == 1]
    wire_edges = [i for i, e in enumerate(g.edges) if e[2] == 0]
    assert gamma_of_edge(g, gate_edges[0]) == pytest.approx(
        1 + 2 * math.sin(math.pi / 8)
    )
    assert gamma_of_edge(g, gate_edges[1]) == pytest.approx(3.0)
    assert gamma_of_edge(g, wire_edges[0]) == pytest.approx(4.0)


def test_qft8_gamma_solve_matches_analytic_and_runtime_budget():
    """qft-8, P2 Q7: the optimum isolates an end qubit (7 cp cuts whose
    angles are pi/2..pi/2^7); solver S == analytic gamma == the sampled
    engine's own cut_gammas product (solver objective and runtime budget
    MUST be the same number)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        cut_gammas,
        sampling_overhead,
    )

    circ = library_qft(8)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=7,
                    gammaMode=True)
    assert cutter.solve()
    m = cutter.plan.metrics
    assert m.S == pytest.approx(_qft_gamma_analytic(8))
    assert m.n_gate_cuts == 7 and m.n_wire_cuts == 0
    assert sorted(m.Q_p) == [1, 7]
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    assert float(np.prod(cut_gammas(virt))) == pytest.approx(m.S)
    assert sampling_overhead(virt)["kappa"] == pytest.approx(m.S * m.S)


def test_parity_vs_gamma_objective_differ_on_qft():
    """The parity objective is angle-blind (S = 6^cuts); gamma mode's S
    is ~8.4 on the same qft-8 — the whole point of the mode."""
    circ = library_qft(8)
    parity = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=7,
                    maxNQpdCuts=7, maxNCuts=7)
    assert parity.solve()
    assert parity.plan.metrics.S == 6**7
    gamma = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=7,
                   gammaMode=True)
    assert gamma.solve()
    assert gamma.plan.metrics.S < 9.0


def test_gamma_mode_ghz_picks_single_cheap_cut():
    """GHZ chain: one cx cut (gamma 3) splits the line; tie-break on Q
    picks the balanced split."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )

    circ = genCirc("ghz", 8, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                    gammaMode=True)
    assert cutter.solve()
    m = cutter.plan.metrics
    assert m.S == pytest.approx(3.0)
    assert m.n_gate_cuts == 1
    assert sorted(m.Q_p) == [4, 4]


def test_gamma_mode_constraints():
    circ = library_qft(8)
    # r5: forceNWireCuts is served by the full-space search (wire cuts
    # are in the gamma search space now)
    c = Circuit(3, 0)
    c.cx(0, 1)
    c.cx(0, 1)
    c.cx(2, 1)
    c.cx(2, 1)
    forced = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=2,
                    gammaMode=True, forceNWireCuts=1)
    assert forced.solve()
    assert forced.plan.metrics.n_wire_cuts == 1
    # K8 interaction graph: caps 7|7 pin exactly one qubit's initial to
    # the small side and every segment of it is stuck there (a moved
    # segment would overflow the full side), so all 7 of its gates cross
    # — unsat at maxNCuts=5 even over the full plan space
    tight = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=7,
                   gammaMode=True, maxNCuts=5)
    assert not tight.solve()
    ok = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=7,
                gammaMode=True, forceNGateCuts=7)
    assert ok.solve()
    assert ok.plan.metrics.n_gate_cuts == 7


def test_gamma_mode_uncuttable_gates_bind_qubits():
    """A swap (not virtualizable) forces its qubits into one partition."""
    c = Circuit(4, 0)
    c.cp(math.pi / 2, 0, 1)
    c.swap(1, 2)
    c.cz(2, 3)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=3,
                    gammaMode=True)
    assert cutter.solve()
    plan = cutter.plan
    g = read_circuit(c.decompose())
    part_of_qubit = {}
    for v_idx, p in enumerate(plan.assignment):
        part_of_qubit.setdefault(g.vertices[v_idx].qubit, p)
    assert part_of_qubit[1] == part_of_qubit[2]
    # cheapest crossing: the cp(pi/2) cut (gamma 2.414) not the cz (3)
    assert plan.metrics.S == pytest.approx(1 + 2 * math.sin(math.pi / 4))


def test_gamma_mode_resolve_enumeration():
    """Repeat solve() enumerates further static plans, gamma
    non-decreasing (Cutter.py:96-102 re-solve parity)."""
    circ = library_qft(6)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                    gammaMode=True)
    assert cutter.solve()
    s0 = cutter.plan.metrics.S
    first = tuple(cutter.plan.assignment)
    assert cutter.solve()
    assert tuple(cutter.plan.assignment) != first
    assert cutter.plan.metrics.S >= s0 - 1e-12


def test_gamma_plan_roundtrips_and_rewrites():
    """Float-S plans serialize and the rewrite fragments them cleanly."""
    circ = library_qft(6)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                    gammaMode=True)
    assert cutter.solve()
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.plan import (
        CutPlan,
    )

    plan2 = CutPlan.from_json(cutter.plan.to_json())
    assert plan2.metrics.S == pytest.approx(cutter.plan.metrics.S)
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    assert len(virt.fragments) == 2
    sizes = sorted(p.num_data_qubits for p in virt.programs.values())
    assert sizes == [1, 5]


def test_qft8_sampled_machinery_cpu_scale():
    """The qft-16 TPU delivery's machinery at CPU scale: gamma-mode plan
    -> sampled engine (LHS + control variate) -> marginal vs the exact
    uncut oracle.  A random product-state input makes the output
    distribution non-degenerate (plain QFT|0..0> is uniform)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit_host,
    )

    n = 8
    rng = np.random.default_rng(7)
    circ = Circuit(n, n)
    for q in range(n):
        circ.h(q)
        circ.rz(float(rng.uniform(0, 2 * math.pi)), q)
    body = library_qft(n)
    for ins in body.instructions:
        circ.instructions.append(ins.copy())
    for q in range(n):
        circ.measure(q, q)

    cutter = Cutter(circ, maxNPartitions=2,
                    maxNQubitsPerPartition=n - 1, gammaMode=True)
    assert cutter.solve()
    assert cutter.plan.metrics.S == pytest.approx(_qft_gamma_analytic(n))
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    keep = [0, 1, 2]
    est, se = sampled_knit(
        virt, 60_000, seed=11, keep_clbits=keep, with_stderr=True,
        method="lhs", control_variate=True,
    )
    probs = np.asarray(simulate_circuit_host(circ).values, np.float64)
    v = probs.reshape([2] * n)  # axis n-1-j carries clbit j
    marg = v.sum(axis=tuple(range(n - len(keep))))  # keep clbits 2,1,0
    oracle = np.array([
        marg[tuple((b >> j) & 1 for j in reversed(keep))]
        for b in range(1 << len(keep))
    ])
    err = np.abs(np.asarray(est.values, np.float64) - oracle)
    # within 5 sigma of the estimator's own stderr, and small in absolute
    # terms (the artifact's eps-style bound)
    assert float(err.max()) <= max(5.0 * float(se.max()), 1e-4)
    assert float(err.max()) < 0.02


def test_gamma_mode_three_partitions():
    """P=3 qubit-level B&B: ghz-9 at caps 3 needs exactly 2 cx cuts
    (gamma 3 each) splitting the chain into thirds."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )

    cutter = Cutter(genCirc("ghz", 9, 1), maxNPartitions=3,
                    maxNQubitsPerPartition=3, gammaMode=True)
    assert cutter.solve()
    m = cutter.plan.metrics
    assert m.S == pytest.approx(9.0)
    assert m.n_gate_cuts == 2
    assert sorted(m.Q_p) == [3, 3, 3]
    # the plan executes end-to-end at fidelity 1
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    circ = genCirc("ghz", 9, 1)
    cutter2 = Cutter(circ, maxNPartitions=3, maxNQubitsPerPartition=3,
                     gammaMode=True)
    assert cutter2.solve()
    dist, _ = run_virtual_circuit(
        VirtualCircuit(cutter2.getResultCircs()[3])
    )
    assert hellinger_fidelity(simulate_circuit(circ), dist) > 1 - 1e-6


@pytest.mark.parametrize("name,n,depth,cap,expect", [
    ("aqft", 16, 1, 15, None),   # 5 kept cp gates cross the 15|1 split
    ("hwe", 16, 5, 10, 3.0**5),  # cx cuts: textbook gamma 3 each
    ("add", 10, 1, 9, 3.0),      # single cx cut
])
def test_gamma_mode_generality(name, n, depth, cap, expect):
    """The solver's gamma objective equals the sampled engine's own
    budget (prod cut_gammas) across circuit families — angle-dependent
    (aqft cp) and fixed (hwe/add cx) cuts alike."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        cut_gammas,
    )

    cutter = Cutter(genCirc(name, n, depth), maxNPartitions=2,
                    maxNQubitsPerPartition=cap, gammaMode=True)
    assert cutter.solve()
    m = cutter.plan.metrics
    if expect is not None:
        assert m.S == pytest.approx(expect)
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    assert float(np.prod(cut_gammas(virt))) == pytest.approx(m.S)


# ---------------------------------------------------------------------------
# r5: full-plan-space differential (VERDICT r4 action #5).  The gamma
# search must be optimal over ALL plans — gate cuts + wire cuts +
# per-vertex partition assignments — verified against an INDEPENDENT
# brute-force evaluator (full P^V enumeration, no code shared with
# cutter/gamma.py's search) and cross-checked against the second
# independent implementation (solve_gamma_vertex).
# ---------------------------------------------------------------------------
import itertools

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.gamma import (
    solve_gamma,
    solve_gamma_vertex,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.graph import (
    GATE_UNCUTTABLE,
    WIRE,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.solver import (
    SolverConfig,
)


def _brute_force_gamma_best(circ, P, caps, **limits):
    """Exhaustive full-plan-space optimum: every per-vertex assignment,
    gamma_total = product of crossing-edge 1-norms (wire edges included
    at gamma 4), reference Q_p/C_p accounting.  Returns the best
    (gamma, Q, C) key or None."""
    g = read_circuit(circ.copy().decompose())
    nv = g.num_vertices
    gammas = [
        gamma_of_edge(g, ei) if kind != GATE_UNCUTTABLE else None
        for ei, (_u, _v, kind) in enumerate(g.edges)
    ]
    spare = sum(caps) - circ.num_qubits
    best = None
    for assignment in itertools.product(range(P), repeat=nv):
        q_p = [0] * P
        c_p = [0] * P
        for vi in g.initial:
            q_p[assignment[vi]] += 1
        s = 1.0
        n_wire = n_gate = 0
        ok = True
        for ei, (u, v, kind) in enumerate(g.edges):
            if assignment[u] == assignment[v]:
                continue
            if kind == GATE_UNCUTTABLE:
                ok = False
                break
            s *= gammas[ei]
            c_p[assignment[u]] += 1
            c_p[assignment[v]] += 1
            if kind == WIRE:
                n_wire += 1
                q_p[assignment[v]] += 1
            else:
                n_gate += 1
        if not ok:
            continue
        if any(q_p[p] > caps[p] for p in range(P)):
            continue
        if n_wire > spare:
            continue
        mx = limits.get("maxNCuts")
        if mx is not None and n_wire + n_gate > mx:
            continue
        mq = limits.get("maxNQpdCuts")
        if mq is not None and n_wire + n_gate > mq:
            continue
        mcp = limits.get("maxCutsPerPartitions")
        if mcp is not None and any(c > mcp for c in c_p):
            continue
        fw = limits.get("forceNWireCuts")
        if fw is not None and n_wire != fw:
            continue
        fg = limits.get("forceNGateCuts")
        if fg is not None and n_gate != fg:
            continue
        key = (s, max(q_p), max(c_p))
        if best is None or key < best:
            best = key
    return best


def _wire_beats_gates_circ():
    """The static-plan counterexample: q1 talks to q0 twice then to q2
    twice — one wire cut (gamma 4) beats the two cx cuts (gamma 9) any
    static assignment needs."""
    c = Circuit(3, 0)
    c.cx(0, 1)
    c.cx(0, 1)
    c.cx(2, 1)
    c.cx(2, 1)
    return c


def _mixed_angles_circ():
    c = Circuit(4, 0)
    c.cx(0, 1)
    c.cp(math.pi / 2, 1, 2)
    c.cp(math.pi / 8, 0, 2)
    c.rzz(0.3, 2, 3)
    c.cx(1, 3)
    return c


def _uncuttable_circ():
    c = Circuit(4, 0)
    c.cp(math.pi / 2, 0, 1)
    c.swap(1, 2)
    c.cz(2, 3)
    c.cx(0, 3)
    return c


@pytest.mark.parametrize("make,P,cap,limits", [
    (_wire_beats_gates_circ, 2, 2, {}),
    (_wire_beats_gates_circ, 2, 2, {"forceNWireCuts": 1}),
    (lambda: library_qft(4), 2, 3, {}),
    (lambda: library_qft(4), 2, 3, {"maxNCuts": 4}),
    (_mixed_angles_circ, 2, 3, {}),
    (_mixed_angles_circ, 2, 2, {}),
    (_uncuttable_circ, 2, 3, {}),
])
def test_gamma_full_plan_space_differential(make, P, cap, limits):
    circ = make()
    caps = [cap] * P
    brute = _brute_force_gamma_best(circ, P, caps, **limits)
    cutter = Cutter(circ, maxNPartitions=P, maxNQubitsPerPartition=cap,
                    gammaMode=True, **limits)
    solved = cutter.solve()
    if brute is None:
        assert not solved
        return
    assert solved
    m = cutter.plan.metrics
    assert m.S == pytest.approx(brute[0], rel=1e-12)
    assert (m.Q, m.C) == (brute[1], brute[2])
    # second independent implementation agrees (vertex-level B&B)
    g = read_circuit(circ.copy().decompose())
    cfg = SolverConfig(
        num_partitions=P, caps=caps,
        force_n_wire_cuts=limits.get("forceNWireCuts"),
        force_n_gate_cuts=limits.get("forceNGateCuts"),
        max_n_cuts=limits.get("maxNCuts"),
        max_n_qpd_cuts=limits.get("maxNQpdCuts"),
        max_cuts_per_partition=limits.get("maxCutsPerPartitions"),
        spare_capacity=sum(caps) - circ.num_qubits,
        gamma_mode=True,
    )
    vplan, completed = solve_gamma_vertex(g, cfg)
    assert completed
    assert vplan is not None
    assert vplan.metrics.S == pytest.approx(brute[0], rel=1e-12)


def test_gamma_wire_cut_plan_executes_end_to_end():
    """The wire-cut gamma plan is not just priced — it rewrites,
    fragments and knits at fidelity 1 through the standard pipeline."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    c = Circuit(3, 3)
    c.h(0)
    c.cx(0, 1)
    c.cx(0, 1)
    c.h(1)
    c.cx(2, 1)
    c.cx(2, 1)
    for q in range(3):
        c.measure(q, q)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=2,
                    gammaMode=True)
    assert cutter.solve()
    assert cutter.plan.metrics.n_wire_cuts == 1
    assert cutter.plan.metrics.S == pytest.approx(4.0)
    dist, _ = run_virtual_circuit(
        VirtualCircuit(cutter.getResultCircs()[3])
    )
    assert hellinger_fidelity(simulate_circuit(c), dist) > 1 - 1e-6


def test_gamma_budget_fallback_logs_partial_guarantee():
    """When the split enumeration cannot finish a w level inside the
    budget it must stop BEFORE that level and say so."""
    import logging

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter import (
        gamma as gamma_mod,
    )

    class _Cap(logging.Handler):
        def __init__(self):
            super().__init__(level=logging.WARNING)
            self.msgs = []

        def emit(self, record):
            self.msgs.append(record.getMessage())

    log = logging.getLogger("HwAwareCutterTPU")
    h = _Cap()
    log.addHandler(h)
    old_budget = gamma_mod.SPLIT_COMBO_BUDGET
    gamma_mod.SPLIT_COMBO_BUDGET = 1
    try:
        cutter = Cutter(_wire_beats_gates_circ(), maxNPartitions=2,
                        maxNQubitsPerPartition=2, gammaMode=True)
        assert cutter.solve()
        # w=1 level (3 wire edges > budget 1) skipped: static optimum
        assert cutter.plan.metrics.n_wire_cuts == 0
        assert cutter.plan.metrics.S == pytest.approx(9.0)
    finally:
        gamma_mod.SPLIT_COMBO_BUDGET = old_budget
        log.removeHandler(h)
    assert any("optimal among plans with <=" in m for m in h.msgs), h.msgs
