"""Property-based end-to-end test: ANY random circuit that the cutter can
partition must knit back to the uncut distribution (the framework's core
identity), across random gate sets, structures and cut mixes."""
import numpy as np
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

N_QUBITS = 5

_1Q = ["h", "x", "y", "z", "s", "t", "sdg"]
_1QP = ["rx", "ry", "rz"]
_2Q = ["cx", "cy", "cz", "swap"]
_2QP = ["rzz", "cp"]


@st.composite
def circuits(draw):
    circ = Circuit(N_QUBITS, N_QUBITS)
    n_gates = draw(st.integers(4, 14))
    for _ in range(n_gates):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            getattr(circ, draw(st.sampled_from(_1Q)))(
                draw(st.integers(0, N_QUBITS - 1))
            )
        elif kind == 1:
            getattr(circ, draw(st.sampled_from(_1QP)))(
                draw(st.floats(-3.0, 3.0)), draw(st.integers(0, N_QUBITS - 1))
            )
        else:
            a = draw(st.integers(0, N_QUBITS - 1))
            b = draw(st.integers(0, N_QUBITS - 2))
            if b >= a:
                b += 1
            if kind == 2:
                getattr(circ, draw(st.sampled_from(_2Q)))(a, b)
            else:
                getattr(circ, draw(st.sampled_from(_2QP)))(
                    draw(st.floats(-3.0, 3.0)), a, b
                )
    for q in range(N_QUBITS):
        circ.measure(q, q)
    return circ


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(circ=circuits(), cap=st.integers(3, 4))
def test_random_circuit_knits_exactly(circ, cap):
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    if not cutter.solve():
        return  # infeasible under the budget — nothing to check
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    knitted, _ = run_virtual_circuit(virt, project=False)
    ideal = simulate_circuit(circ)
    fid = hellinger_fidelity(ideal, knitted)
    assert fid > 1 - 1e-5, fid
    total = float(np.sum(np.asarray(knitted.values)))
    assert total == pytest.approx(1.0, abs=1e-4)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(circ=circuits(), cap=st.integers(3, 4))
def test_random_circuit_streamed_matches_batched(circ, cap):
    """The streamed scan (index gather + lazy introduction + prefix
    sharing) must agree with the batched engine on arbitrary random cut
    sets — the engines share no code path after make_sim_fn."""
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    if not cutter.solve():
        return
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    batched, _ = run_virtual_circuit(virt, project=False)
    streamed, _ = run_virtual_circuit(virt, project=False, engine="streamed",
                                      chunk_size=16)
    assert batched.bit_positions == streamed.bit_positions
    np.testing.assert_allclose(
        np.asarray(streamed.values), np.asarray(batched.values), atol=5e-6
    )


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(circ=circuits(), cap=st.integers(3, 4))
def test_random_circuit_staged_suffix_matches_flat(circ, cap):
    """In-chunk staged suffix dedup (variant_engine.suffix_stages) must be
    a pure execution-plan transformation on ANY cut topology: a tight
    bank budget forces a shallow split (multi-vgate suffix), an aligned
    chunk engages the group ladder, and the values must equal the flat
    scan's."""
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    if not cutter.solve():
        return
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    flat_step, flat_xs, _ = make_streamed_knit(virt, 24, share_prefix=False)
    flat = np.asarray(jax.jit(flat_step)(flat_xs))
    _, _, meta0 = make_streamed_knit(
        virt, 24, share_prefix=True, bank_budget_bytes=1 << 12,
    )
    chunk = max(meta0["stage_align"], 8)
    step, xs, meta = make_streamed_knit(
        virt, chunk, share_prefix=True, bank_budget_bytes=1 << 12,
        hoist_banks=True,
    )
    got = np.asarray(jax.jit(step)(xs))
    np.testing.assert_allclose(got, flat, atol=5e-6)
    if meta["bank_fn"] is not None:
        banks = jax.jit(meta["bank_fn"])()
        got2 = np.asarray(jax.jit(step)(xs, banks))
        np.testing.assert_allclose(got2, flat, atol=5e-6)
