"""Parity tests: native C++ solver vs the pure-Python reference solver on
random cut problems, plus timing sanity on benchmark-scale graphs."""
import random

import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.graph import (
    read_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.native_solver import (
    native_available,
    solve_native,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.solver import (
    SolverConfig,
    solve_python,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native solver not built"
)


def random_config(circ, seed):
    rng = random.Random(seed)
    p = rng.choice([2, 3])
    cap = rng.randint(
        max(2, circ.num_qubits // p), circ.num_qubits
    )
    return SolverConfig(
        num_partitions=p,
        caps=[cap] * p,
        max_n_cuts=rng.choice([2, 3, 5]),
        max_n_qpd_cuts=rng.choice([None, 5]),
        max_cuts_per_partition=rng.choice([None, 5]),
        spare_capacity=rng.choice([None, 0, 1, cap * p - circ.num_qubits]),
    )


@pytest.mark.parametrize("name,n", [("ghz", 6), ("bv", 5), ("qft", 5),
                                    ("hwe", 6), ("add", 6)])
def test_native_matches_python_metrics(name, n):
    circ = genCirc(name, n, 1).decompose()
    graph = read_circuit(circ)
    for seed in range(3):
        cfg = random_config(circ, seed)
        p_plan = solve_python(graph, cfg)
        n_plan = solve_native(graph, cfg)
        if p_plan is None:
            assert n_plan is None
            continue
        assert n_plan is not None
        pm, nm = p_plan.metrics, n_plan.metrics
        # identical lexicographic objective values (solutions may differ in
        # tie-broken assignment like the reference's z3 model choice)
        assert (pm.Q, pm.S, pm.A, pm.L, pm.C) == (nm.Q, nm.S, nm.A, nm.L, nm.C)
        assert (p_plan.soft_satisfied, pm.n_wire_cuts + pm.n_gate_cuts) == (
            n_plan.soft_satisfied, nm.n_wire_cuts + nm.n_gate_cuts
        )


def test_native_unsat():
    circ = genCirc("ghz", 4, 1)
    graph = read_circuit(circ.decompose())
    cfg = SolverConfig(2, [2, 2], force_n_wire_cuts=0, force_n_gate_cuts=0,
                       max_n_cuts=1)
    assert solve_python(graph, cfg) is None
    assert solve_native(graph, cfg) is None


def test_native_speed_ghz24():
    """The reference's z3 takes 12-14 min on ghz-24 P2 Q12 (BASELINE.md);
    the native solver must do it in seconds."""
    import time

    circ = genCirc("ghz", 24, 1)
    graph = read_circuit(circ.decompose())
    cfg = SolverConfig(2, [12, 12], max_n_cuts=5, max_n_qpd_cuts=5,
                       max_cuts_per_partition=5)
    t0 = time.time()
    plan = solve_native(graph, cfg)
    dt = time.time() - t0
    assert plan is not None
    assert plan.metrics.Q == 12
    assert dt < 30, f"native solve took {dt}s"
