"""Analytic performance model (ops/roofline.py) and lane-layout engine
(ops/lane_engine.py).

The roofline model walks make_sim_fn's REAL execution plan, so these
tests pin its accounting against independently computable facts; the
lane engine must be bit-identical to the reference vmap(sim_one) path.
"""
import numpy as np
import jax

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.lane_engine import (
    make_lane_sim,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (
    fragment_cost,
    streamed_step_model,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    make_sim_fn,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(kind, n, d, Q):
    circ = genCirc(kind, n, d)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=Q,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def test_fragment_cost_counts_the_real_plan():
    virt = _cut("hwe", 8, 2, 5)
    for reg in virt.fragments:
        fc = fragment_cost(virt, reg.name)
        # fragment_cost models the production plan: fused slot triples
        sim_one, _, _, V = make_sim_fn(
            virt, reg.name, build_matrices=False, fused_slots=True
        )
        assert fc.num_variants == V
        assert fc.steps == len(sim_one.run_plan)
        # every gate/slot pass at most at full width; lazy widths keep the
        # histogram's max at num_sim_qubits
        assert fc.bytes_per_variant > 0
        assert max(fc.width_histogram) <= fc.sim_qubits
        # upper bound: every pass at full width
        passes = sum(fc.width_histogram.values())
        assert fc.bytes_per_variant <= (
            passes * 2 * (1 << fc.sim_qubits) * 8
            + 4 * (1 << fc.sim_qubits) * 8  # ins + finish slack
        )


def test_lazy_widths_beat_naive_full_width():
    """aqft's triangular structure must show real lazy-width savings."""
    virt = _cut("aqft", 10, 1, 6)
    for reg in virt.fragments:
        fc = fragment_cost(virt, reg.name)
        naive = sum(fc.width_histogram.values()) * 2 * (
            1 << fc.sim_qubits
        ) * 8
        assert fc.bytes_per_variant < naive, (fc.bytes_per_variant, naive)


def test_streamed_step_model_totals():
    virt = _cut("hwe", 8, 2, 5)
    m = streamed_step_model(virt, chunk=16)
    labels = 1
    for vg in virt.vgates:
        labels *= vg.spec.num_instantiations
    assert m.global_labels == labels
    assert m.n_chunks == -(-labels // 16)
    per_frag = sum(f.bytes_per_variant for f in m.fragments) * labels
    assert m.total_bytes > per_frag  # folds + knit on top
    assert m.seconds(819e9) > 0
    # the exact engines are bandwidth-bound: intensity far below the
    # v5e f32 ridge (~60 flops/byte)
    assert m.flops_per_byte < 16


def test_lane_engine_matches_vmap_rows():
    """Trailing-chunk (lane) layout is bit-identical to vmap(sim_one) —
    covers gate cuts, wire cuts (deferral ancillas) and slotless frags."""
    for kind, n, d, Q in [("hwe", 8, 2, 5), ("aqft", 6, 1, 4)]:
        virt = _cut(kind, n, d, Q)
        for reg in virt.fragments:
            prog = virt.programs[reg.name]
            sim_one, all_mats, pos, V = make_sim_fn(virt, reg.name)
            sim_chunk, pos2, V2 = make_lane_sim(virt, reg.name)
            assert (pos, V) == (pos2, V2)
            if not prog.slots:
                continue
            C = min(V, 32)
            mats = [tuple(np.asarray(m[:C]) for m in t) for t in all_mats]
            lead = np.asarray(jax.jit(jax.vmap(sim_one))(mats))
            lane = np.asarray(jax.jit(sim_chunk)(mats))
            assert lane.shape == lead.T.shape
            # bit-exact for power-of-2 chunks (identical slice-combine
            # programs); non-pow2 chunks fall back to the einsum path
            # for const blocks, so allow f32 rounding differences
            np.testing.assert_allclose(lane, lead.T, atol=2e-6)


def test_diagonal_fast_path_matches_general_einsum():
    """apply_matrix routes host-constant diagonal blocks through the
    fused elementwise pass (no transposes); values must match the
    general einsum path exactly, including unsorted axes."""
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit import (
        gates as G,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        apply_matrix,
        diag_of_block,
        to_real_block,
    )

    rng = np.random.default_rng(0)
    n = 6
    for axes in [(4,), (5, 1), (1, 5), (4, 0, 2)]:
        k = len(axes)
        u = np.diag(np.exp(1j * rng.random(1 << k) * 6)).astype(complex)
        blk = to_real_block(u)
        assert diag_of_block(blk) is not None
        st = rng.random((2, 1 << n)).astype(np.float32)
        fast = np.asarray(apply_matrix(jnp.asarray(st), blk, axes, n))
        # a traced (jnp) block skips diagonal detection -> general path
        slow = np.asarray(
            apply_matrix(jnp.asarray(st), jnp.asarray(blk), axes, n)
        )
        np.testing.assert_allclose(fast, slow, atol=1e-6)
    assert diag_of_block(to_real_block(np.asarray(G.H))) is None
