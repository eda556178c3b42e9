"""Angle-aware cut search: minimise the TRUE sampling 1-norm gamma_total.

The reference's cost model charges every gate cut a flat sampling
multiplier of 6 and every wire cut 8 (src/HwAwareCutter/Cutter.py:452-471)
— angle-blind: the actual QPD 1-norm of a parameterised cut gate depends
on its angle (/root/reference/third_party/qvm/qvm/virtual_gates.py:262-291,
cos/sin(theta/2) coefficients), with gamma(cp(theta)) -> 1 as theta -> 0.
On QFT-class circuits the difference is the whole story: qft-16's minimum
cut set is 15 crossing cp gates (S_parity = 6^15 ~ 4.7e11, proved
infeasible at the reference model — qft16_boundary.json), while the true
gamma_total of the same cuts is ~8.5 (kappa = gamma^2 ~ 73), squarely
inside the sampled engine's budget (ops/qpd_sampling.py).

``gamma_mode`` (Cutter(gammaMode=True)) replaces the per-cut parity
multipliers with each candidate edge's true QPD 1-norm
(:func:`gamma_of_edge`, the solver-side twin of
ops/qpd_sampling.cut_gammas — the two share the ``sum_v max_b |coef|``
convention) and minimises the product.  The reference-parity table stays
the default.

DELIBERATE DESIGN (documented deviation): the gamma-mode search is exact
over *static* plans — every qubit's vertices stay in one partition, so
cuts are exactly the crossing gate edges and wire cuts are never
selected.  Rationale: (a) a wire cut always multiplies gamma by exactly
4 (move_spec 1-norm) while the gate cut it would displace costs
1 <= gamma <= 3, so wire cuts only win in corner cases the parity mode
already serves; (b) the vertex-level branch-and-bound of
solver.solve_python is intractable under the angle-aware objective —
small-angle cuts are nearly FREE (gamma ~ 1 + theta), so the bound
``partial product < best`` admits exponentially many near-zero-cost cut
subsets (qft-16: 2^36 sub-threshold combinations of its d >= 8 gates
alone).  The static search is exhaustive over qubit assignments
(branch-and-bound at qubit-group level; uncuttable 2q gates merge their
qubits into one group) and therefore optimal within its class.
Teleport cuts are never selected either: gamma_mode optimises QPD
sampling cost, which teleportation does not incur (the reference treats
teleport cuts as cost-model-only anyway, Cutter.py:574 FIXME).
"""
from __future__ import annotations

import math

from ..virt.tables import VIRTUAL_GATE_NAMES, spec_for
from .graph import GATE, GATE_UNCUTTABLE, WIRE, CutGraph
from .plan import CutDecision, CutPlan, PlanMetrics
from .solver import plan_signature


def gamma_of_spec(spec) -> float:
    """QPD sampling 1-norm ``gamma = sum_v max_b |coef[v, b]|`` — MUST
    match ops/qpd_sampling._variant_magnitudes' convention (the sampled
    engine draws with exactly these magnitudes; the solver objective and
    the runtime budget must be the same number, tested in
    tests/test_gamma_mode.py)."""
    import numpy as np

    coef = np.asarray(spec.coef, np.float64)
    return float(np.maximum(np.abs(coef[:, 0]), np.abs(coef[:, 1])).sum())


def gamma_of_edge(graph: CutGraph, edge_idx: int) -> float:
    """True QPD 1-norm of cutting candidate edge ``edge_idx``: the gate's
    angle-aware gamma for GATE edges (cx/cy/cz = 3, rzz/cp = cos/sin
    table sums), the wire-move gamma 4 for WIRE edges, +inf for
    uncuttable gates."""
    u, v, kind = graph.edges[edge_idx]
    if kind == WIRE:
        return gamma_of_spec(spec_for("move"))
    if kind == GATE_UNCUTTABLE:
        return math.inf
    ins = graph.vertices[u].instr
    assert ins.name in VIRTUAL_GATE_NAMES, ins.name
    return gamma_of_spec(spec_for(ins.name, ins.params))


def solve_gamma(graph: CutGraph, cfg) -> CutPlan | None:
    """Gamma-mode exact search (see module docstring for the class of
    plans).  Honors caps, maxNCuts/maxNQpdCuts, maxCutsPerPartitions,
    forceNGateCuts and re-solve enumeration (cfg.exclude); wire cuts and
    teleports are never selected, so forceNWireCuts > 0 is rejected by
    the Cutter constructor.

    Lexicographic objective: (gamma_total, Q, C) — sampling cost FIRST
    (deliberately reordered vs the parity mode's Q-first key: when the
    point is minimising kappa = gamma^2, a wider-but-cheaper fragment
    beats a balanced-but-expensive split; capacity still binds Q_p hard).
    """
    if cfg.force_n_wire_cuts:
        return None  # static plans have no wire cuts
    nv = graph.num_vertices
    if nv == 0:
        if cfg.exclude or cfg.force_n_gate_cuts:
            return None
        return CutPlan(
            cfg.num_partitions, [], [],
            PlanMetrics(
                S=1.0, A=0, L=0, Q=0, C=0,
                Q_p=[0] * cfg.num_partitions,
                C_p=[0] * cfg.num_partitions,
                n_wire_cuts=0, n_gate_cuts=0,
            ),
            True,
        )
    if cfg.num_partitions > nv:
        raise ValueError("more partitions than cut-graph vertices")

    # ---- qubit groups: union-find over uncuttable gate edges ----------
    qubit_ids: list[int] = []
    qpos: dict[int, int] = {}
    for vtx in graph.vertices:
        if vtx.qubit not in qpos:
            qpos[vtx.qubit] = len(qubit_ids)
            qubit_ids.append(vtx.qubit)
    parent = list(range(len(qubit_ids)))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (u, v, kind) in graph.edges:
        if kind == GATE_UNCUTTABLE:
            a = find(qpos[graph.vertices[u].qubit])
            b = find(qpos[graph.vertices[v].qubit])
            if a != b:
                parent[max(a, b)] = min(a, b)

    roots = sorted({find(i) for i in range(len(qubit_ids))})
    group_of_qubit = {qubit_ids[i]: roots.index(find(i))
                      for i in range(len(qubit_ids))}
    ng = len(roots)
    group_size = [0] * ng
    for i in range(len(qubit_ids)):
        group_size[group_of_qubit[qubit_ids[i]]] += 1

    # ---- cuttable gate edges grouped by the LATER group index ---------
    # (u_group, gamma, edge) per candidate; intra-group edges can never
    # cross a static plan
    adj_prev: list[list[tuple[int, float, tuple[int, int]]]] = [
        [] for _ in range(ng)
    ]
    n_edges_total = 0
    for ei, (u, v, kind) in enumerate(graph.edges):
        if kind != GATE:
            continue
        ga = group_of_qubit[graph.vertices[u].qubit]
        gb = group_of_qubit[graph.vertices[v].qubit]
        if ga == gb:
            continue
        g_lo, g_hi = min(ga, gb), max(ga, gb)
        adj_prev[g_hi].append((g_lo, gamma_of_edge(graph, ei), (u, v)))
        n_edges_total += 1

    cut_bound = cfg.max_n_cuts
    if cfg.max_n_qpd_cuts is not None:
        cut_bound = (cfg.max_n_qpd_cuts if cut_bound is None
                     else min(cut_bound, cfg.max_n_qpd_cuts))
    if cfg.force_n_gate_cuts is not None:
        if cut_bound is not None and cfg.force_n_gate_cuts > cut_bound:
            return None
        cut_bound = (cfg.force_n_gate_cuts if cut_bound is None
                     else min(cut_bound, cfg.force_n_gate_cuts))
    if cut_bound is None:
        cut_bound = n_edges_total

    P = cfg.num_partitions
    symmetric = len(set(cfg.caps)) == 1
    INF_KEY = (math.inf, math.inf, math.inf)
    best: list = [INF_KEY, None]

    assign = [0] * ng
    q_p = [0] * P
    cut_list: list[tuple[float, tuple[int, int]]] = []

    def leaf() -> None:
        n_cuts = len(cut_list)
        if cfg.force_n_gate_cuts is not None and \
                n_cuts != cfg.force_n_gate_cuts:
            return
        c_p = [0] * P
        s_total = 1.0
        for gamma, (u, v) in cut_list:
            s_total *= gamma
            c_p[assign_of_vertex(u)] += 1
            c_p[assign_of_vertex(v)] += 1
        if cfg.max_cuts_per_partition is not None and any(
            c > cfg.max_cuts_per_partition for c in c_p
        ):
            return
        big_q = max(q_p)
        big_c = max(c_p) if c_p else 0
        key = (s_total, big_q, big_c)
        if key >= best[0]:
            return
        assignment = [
            assign[group_of_qubit[vtx.qubit]] for vtx in graph.vertices
        ]
        cuts = [
            CutDecision((u, v), "gate", False) for _, (u, v) in cut_list
        ]
        metrics = PlanMetrics(
            S=s_total, A=0, L=0, Q=big_q, C=big_c,
            Q_p=list(q_p), C_p=c_p,
            n_wire_cuts=0, n_gate_cuts=n_cuts,
        )
        plan = CutPlan(P, assignment, cuts, metrics, True)
        if cfg.exclude and plan_signature(plan) in cfg.exclude:
            return
        best[0] = key
        best[1] = plan

    def assign_of_vertex(v_idx: int) -> int:
        return assign[group_of_qubit[graph.vertices[v_idx].qubit]]

    def dfs(g: int, s_run: float, used_max: int) -> None:
        if g == ng:
            leaf()
            return
        limit = min(P, used_max + 2) if symmetric else P
        for p in range(limit):
            new_cuts = [
                (gamma, e) for (gu, gamma, e) in adj_prev[g]
                if assign[gu] != p
            ]
            if len(cut_list) + len(new_cuts) > cut_bound:
                continue
            s_new = s_run
            for gamma, _ in new_cuts:
                s_new *= gamma
            if q_p[p] + group_size[g] > cfg.caps[p]:
                continue
            # gamma >= 1 for every QPD (trace preservation), so the
            # running product is a valid lower bound on the leaf's S
            if (s_new, 0, 0) >= best[0]:
                continue
            assign[g] = p
            q_p[p] += group_size[g]
            cut_list.extend(new_cuts)
            dfs(g + 1, s_new, max(used_max, p))
            del cut_list[len(cut_list) - len(new_cuts):]
            q_p[p] -= group_size[g]

    dfs(0, 1.0, -1)
    return best[1]
