"""Topology-routing tests (circuit/routing.py).

The router only affects the *noise burden* (extra SWAP CXs + per-device
rate lookup); the simulated distribution must be invariant — that is the
core correctness property checked here.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.routing import (
    HEAVY_HEX_27,
    bfs_placement,
    route_stream,
    snake_placement,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    apply_matrix,
    compile_circuit,
    marginalize_flat,
    probabilities,
    to_real_block,
)


def _simulate_routed(comp, routed):
    n = comp.num_sim_qubits
    state = jnp.zeros((2, 1 << n), dtype=jnp.float32).at[0, 0].set(1.0)
    for (_, u, ax) in routed.ops:
        state = apply_matrix(
            state, to_real_block(np.asarray(u, complex)), ax, n
        )
    probs = jnp.sum(state * state, axis=0)
    pos = sorted(routed.clbit_sources)
    return np.asarray(marginalize_flat(
        probs, n, [routed.clbit_sources[p] for p in pos]
    ))


@pytest.mark.parametrize("name,n,d", [
    ("ghz", 8, 1), ("sup", 12, 1), ("add", 6, 1), ("hwe", 8, 1),
])
def test_routing_preserves_distribution(name, n, d):
    circ = genCirc(name, n, d)
    comp = compile_circuit(circ)
    ideal = probabilities(comp)
    routed = route_stream(
        [("u", u, ax) for u, ax in comp.ops], n,
        dict(comp.clbit_sources), HEAVY_HEX_27,
    )
    got = _simulate_routed(comp, routed)
    np.testing.assert_allclose(got, np.asarray(ideal.values), atol=1e-6)


def test_routing_emits_valid_coupling_ops():
    """Every routed 2q data gate must sit on an edge of the device graph
    (in device-node terms), and swaps appear as 3-CX groups."""
    circ = genCirc("sup", 12, 1)
    comp = compile_circuit(circ)
    routed = route_stream(
        [("u", u, ax) for u, ax in comp.ops], 12,
        dict(comp.clbit_sources), HEAVY_HEX_27,
    )
    edges = {frozenset(e) for e in HEAVY_HEX_27}
    for (kind, _u, ax), ph in zip(routed.ops, routed.phys):
        if kind == "u" and len(ax) == 2 and None not in ph:
            assert frozenset(ph) in edges, (ax, ph)


def test_chain_circuits_route_swap_free():
    """hwe/syc route without swaps (matching the reference's transpiled
    CNOT table: hwe-10 9/9, syc-12 8/8)."""
    for name, n, d in (("hwe", 10, 1), ("syc", 12, 2)):
        comp = compile_circuit(genCirc(name, n, d))
        routed = route_stream(
            [("u", u, ax) for u, ax in comp.ops], n,
            dict(comp.clbit_sources), HEAVY_HEX_27,
        )
        assert routed.num_swaps == 0, (name, routed.num_swaps)


def test_routed_cx_counts_near_reference_table():
    """Routed 2q counts land in the reference's transpiled ballpark
    (BASELINE.md CNOT table) — the noise-realism contract."""
    ref = {("ghz", 24, 1): 68, ("add", 10, 1): 117, ("aqft", 6, 2): 45}
    for (name, n, d), want in ref.items():
        comp = compile_circuit(genCirc(name, n, d))
        routed = route_stream(
            [("u", u, ax) for u, ax in comp.ops], n,
            dict(comp.clbit_sources), HEAVY_HEX_27,
        )
        n2 = sum(
            1 for k, _u, ax in routed.ops if k == "u" and len(ax) == 2
        )
        assert 0.4 * want <= n2 <= 1.6 * want, (name, n2, want)


def test_placements_well_formed():
    assert len(set(bfs_placement(HEAVY_HEX_27, 27))) == 27
    snake = snake_placement(HEAVY_HEX_27, 12)
    edges = {frozenset(e) for e in HEAVY_HEX_27}
    assert snake is not None and len(set(snake)) == 12
    assert all(
        frozenset((a, b)) in edges for a, b in zip(snake, snake[1:])
    )
    with pytest.raises(ValueError):
        bfs_placement(HEAVY_HEX_27, 28)


def test_fragment_slot_ops_pass_through():
    """Routing a FragmentProgram stream keeps slot/ancilla ops intact and
    the noisy fragment runtime still knits to the uncut oracle when the
    noise rates are zero."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_noisy_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    circ = genCirc("ghz", 8, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=5,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    nm = NoiseModel(
        "zero_noise_routed", p1=0.0, p2=0.0, readout01=0.0, readout10=0.0,
        trajectories=1, coupling=HEAVY_HEX_27,
    )
    dist, _ = run_noisy_virtual_circuit(virt, nm)
    fid = hellinger_fidelity(simulate_circuit(circ), dist)
    assert fid > 1 - 1e-5, fid
