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


def test_sampled_collapse_model_counts_the_real_plan():
    """r5 (VERDICT r4 #6): the sampled/collapse cost model must count
    exactly the builder's run_plan — re-derive the byte total by hand
    from the same plan and match it; the kernel floor must be output
    rows + inputs only."""
    import math

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E501
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qft import (  # noqa: E501
        library_qft,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (  # noqa: E501
        sampled_collapse_row_cost,
        sampled_estimate_model,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (  # noqa: E501
        make_sim_fn,
    )

    n = 6
    circ = Circuit(n, n)
    for ins in library_qft(n).instructions:
        circ.instructions.append(ins.copy())
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2,
                    maxNQubitsPerPartition=n - 1, gammaMode=True)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    for reg in virt.fragments:
        b, kept = sampled_collapse_row_cost(
            virt, reg.name, keep_clbits=[0, 1], collapse=True
        )
        # independent recount straight from the plan
        sim_one, _, positions, _ = make_sim_fn(
            virt, reg.name, build_matrices=False, collapse=True,
            fused_slots=False,
        )
        m = sim_one.prefix_width
        expect = 0
        for stp in sim_one.run_plan:
            if stp[0] == "ins":
                expect += (1 << m) * 8 + (1 << (m + 1)) * 8
                m += 1
            elif stp[0] == "collapse":
                expect += 3 * (1 << m) * 8
            else:
                expect += 2 * (1 << m) * 8
        d = len(positions)
        expect += (1 << m) * 8 + (1 << m) * 4
        prog = virt.programs[reg.name]
        expect += len(prog.touching) * 2 * (1 << d) * 4
        w = d
        k_target = sum(1 for p in positions if p in (0, 1))
        while w > k_target:
            expect += ((1 << w) + (1 << (w - 1))) * 4
            w -= 1
        assert b == expect
        assert kept == k_target
        # collapse mode: at least one collapse site on the measuring
        # side means the plan has collapse steps (qft gamma cuts measure)
        # kernel floor: output row + label/u inputs only
        fb, fk = sampled_collapse_row_cost(
            virt, reg.name, keep_clbits=[0, 1], collapse=True,
            pallas=True,
        )
        assert fk == k_target
        assert fb < (1 << k_target) * 4 + 4 * (
            len(virt.vgates) + 4 * max(1, len(prog.slots))
        ) + 1

    m = sampled_estimate_model(virt, rows=100, keep_clbits=[0, 1],
                               collapse=True, second_moment=True)
    # total = per-row sims * rows + 2x row reads for the combine
    per_row = sum(b for _, _, b in m.fragments)
    combine = 2 * sum(100 * (1 << k) * 4 for _, k, _ in m.fragments)
    assert m.total_bytes == per_row * 100 + combine
    assert m.combine_bytes == combine
    assert m.seconds(1e9) == m.total_bytes / 1e9
