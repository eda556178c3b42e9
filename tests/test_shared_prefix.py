"""Tree-shared (ancestor-bank) streamed engine vs the flat scan.

The shared-prefix engine (ops/variant_engine.split_plan + the bank path
in ops/streamed.make_streamed_knit) must be a pure execution-plan
transformation: identical knitted values, marginals, observables, shot
samples and checkpoints as the flat scan, for every cut topology.
Reference role: the Aer batch at qvm/run.py:36-42 re-simulates every
instantiation from scratch; sharing is the TPU-side win on top.
"""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
    make_streamed_knit,
    run_virtual_circuit_streamed,
    streamed_expectation_z,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    make_sim_fn,
    split_plan,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(circ, cap, parts=2, **kw):
    cutter = Cutter(circ, maxNPartitions=parts, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5, **kw)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _mixed(n, seed=5):
    rng = np.random.default_rng(seed)
    circ = Circuit(n, n)
    for q in range(n):
        circ.ry(float(rng.standard_normal()), q)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.cz(0, n - 1)
    circ.rzz(0.7, 1, n - 2)
    for q in range(n):
        circ.measure(q, q)
    return circ


CONFIGS = [
    ("hwe", 8, 2, 2, 5),      # multiple gate cuts
    ("aqft", 6, 2, 2, 5),     # gate + wire cuts (reference Aqft_6 config)
    ("add", 6, 1, 2, 5),      # adder: wire cuts + deferral ancillas
]


@pytest.mark.parametrize("name,n,depth,parts,cap", CONFIGS)
def test_shared_matches_flat(name, n, depth, parts, cap):
    virt = _cut(genCirc(name, n, depth), cap, parts)
    flat = run_virtual_circuit_streamed(virt, chunk=32, share_prefix=False)
    shared = run_virtual_circuit_streamed(virt, chunk=32, share_prefix=True)
    assert shared.bit_positions == flat.bit_positions
    np.testing.assert_allclose(
        np.asarray(shared.values), np.asarray(flat.values), atol=1e-6
    )
    # at least one fragment must actually engage the bank on these configs
    _, _, meta = make_streamed_knit(virt, 32, share_prefix=True)
    assert any(s is not None for s in meta["splits"]), meta["splits"]


def test_shared_matches_flat_three_partitions():
    """P=3: fragments touch vgate SUBSETS — the all-shared split
    deduplicates rows the flat scan recomputes per global label."""
    virt = _cut(_mixed(9, seed=7), 4, parts=3)
    flat = run_virtual_circuit_streamed(virt, chunk=16, share_prefix=False)
    shared = run_virtual_circuit_streamed(virt, chunk=16, share_prefix=True)
    np.testing.assert_allclose(
        np.asarray(shared.values), np.asarray(flat.values), atol=1e-6
    )


def test_shots_path_identical_draws():
    """Same seed -> the shared and flat engines sample the same knitted
    distribution, so the finite-shot outputs agree."""
    virt = _cut(_mixed(6), 4)
    a = run_virtual_circuit_streamed(
        virt, chunk=16, shots=2000, seed=3, share_prefix=False
    )
    b = run_virtual_circuit_streamed(
        virt, chunk=16, shots=2000, seed=3, share_prefix=True
    )
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), atol=1e-6
    )


def test_observable_and_marginal_match():
    virt = _cut(_mixed(6), 4)
    ez_flat = streamed_expectation_z(virt, [0, 2], share_prefix=False)
    ez_shared = streamed_expectation_z(virt, [0, 2], share_prefix=True)
    assert abs(ez_flat - ez_shared) < 1e-6

    import jax

    keep = frozenset([0, 1, 3])
    outs = []
    for share in (False, True):
        step, xs, meta = make_streamed_knit(
            virt, 16, keep_clbits=keep, share_prefix=share
        )
        outs.append(np.asarray(jax.jit(step)(xs)))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)


def test_checkpoint_resume_with_sharing(tmp_path):
    virt = _cut(_mixed(6), 4)
    want = run_virtual_circuit_streamed(virt, chunk=8, share_prefix=True)
    # interrupted run: execute only the first segments by monkey-running
    # the full checkpointed path twice — the second call must resume
    d = tmp_path / "ck"
    got = run_virtual_circuit_streamed(
        virt, chunk=8, checkpoint_dir=d, segment_chunks=2,
        share_prefix=True,
    )
    np.testing.assert_allclose(
        np.asarray(got.values), np.asarray(want.values), atol=1e-6
    )
    # resume from a finished checkpoint: no recompute, same values
    again = run_virtual_circuit_streamed(
        virt, chunk=8, checkpoint_dir=d, segment_chunks=2,
        share_prefix=True,
    )
    np.testing.assert_allclose(
        np.asarray(again.values), np.asarray(want.values), atol=1e-6
    )


def test_split_plan_declines_when_flat_is_cheaper():
    """ghz: a single early cut — nothing worth sharing; the planner must
    return None rather than pay bank+gather for no prefix."""
    circ = Circuit(8, 8)
    circ.h(0)
    for i in range(7):
        circ.cx(i, i + 1)
    for q in range(8):
        circ.measure(q, q)
    virt = _cut(circ, 5)
    specs = [vg.spec for vg in virt.vgates]
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    for reg in virt.fragments:
        sim_one, _, _, _ = make_sim_fn(virt, reg.name, build_matrices=False)
        sp = split_plan(sim_one, virt.programs[reg.name], specs, total)
        assert sp is None


def test_split_plan_respects_bank_budget():
    virt = _cut(genCirc("hwe", 8, 2), 5)
    specs = [vg.spec for vg in virt.vgates]
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    for reg in virt.fragments:
        sim_one, _, _, _ = make_sim_fn(virt, reg.name, build_matrices=False)
        sp = split_plan(
            virt and sim_one, virt.programs[reg.name], specs, total,
            bank_budget_bytes=0,
        )
        assert sp is None  # a zero budget forbids every bank


@pytest.mark.parametrize("name,n,depth,parts,cap", CONFIGS)
def test_fused_slots_match_unfused(name, n, depth, parts, cap):
    """One composed (post @ meas @ pre) block per endpoint must reproduce
    the three-step slot application exactly, with and without prefix
    sharing."""
    import jax

    virt = _cut(genCirc(name, n, depth), cap, parts)
    outs = {}
    for fused in (False, True):
        for share in (False, True):
            step, xs, _ = make_streamed_knit(
                virt, 32, share_prefix=share, fused_slots=fused
            )
            outs[(fused, share)] = np.asarray(jax.jit(step)(xs))
    base = outs[(False, False)]
    for key, vals in outs.items():
        np.testing.assert_allclose(vals, base, atol=1e-6, err_msg=str(key))


def test_fused_slots_shrink_the_plan():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (
        fragment_cost,
    )

    virt = _cut(genCirc("aqft", 6, 2), 5)
    for reg in virt.fragments:
        unfused, _, _, _ = make_sim_fn(virt, reg.name, build_matrices=False)
        fused, _, _, _ = make_sim_fn(
            virt, reg.name, build_matrices=False, fused_slots=True
        )
        n_slots = len(virt.programs[reg.name].slots)
        assert sum(
            1 for s in fused.run_plan if s[0] == "slot"
        ) == n_slots
        assert not any(s[0].startswith("slot_") for s in fused.run_plan)
        assert len(fused.run_plan) < len(unfused.run_plan)
        # the byte model must see the saving too
        fc = fragment_cost(virt, reg.name)
        assert fc.steps == len(fused.run_plan)


def test_roofline_share_model_shrinks():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (
        streamed_step_model,
    )

    virt = _cut(genCirc("hwe", 8, 2), 5)
    flat = streamed_step_model(virt)
    shared = streamed_step_model(virt, share_prefix=True)
    assert shared.total_bytes < flat.total_bytes
    hoisted = streamed_step_model(virt, share_prefix=True, hoist_banks=True)
    assert hoisted.total_bytes <= shared.total_bytes


def test_hoisted_banks_match_in_program_banks():
    """The serving shape (banks built once via meta["bank_fn"], passed to
    step_fn(xs, banks)) must reproduce the in-program bank path exactly,
    and the hoisted split selection must still beat or match the flat
    scan per step."""
    import jax

    virt = _cut(genCirc("aqft", 6, 2), 5)
    step, xs, meta = make_streamed_knit(
        virt, 32, share_prefix=True, hoist_banks=True
    )
    assert any(s is not None for s in meta["splits"])
    banks = jax.jit(meta["bank_fn"])()
    hoisted = np.asarray(jax.jit(step)(xs, banks))
    in_program = np.asarray(jax.jit(step)(xs))
    np.testing.assert_allclose(hoisted, in_program, atol=1e-6)

    flat_step, flat_xs, _ = make_streamed_knit(virt, 32, share_prefix=False)
    flat = np.asarray(jax.jit(flat_step)(flat_xs))
    np.testing.assert_allclose(hoisted, flat, atol=1e-6)

    # hoisted scoring drops the one-time build bytes from est_bytes
    for sp in meta["splits"]:
        if sp is not None:
            assert sp.build_bytes > 0
            assert sp.est_bytes <= sp.est_flat_bytes


def test_staged_suffix_multi_stage_matches_flat():
    """In-chunk suffix staging (variant_engine.suffix_stages): with a
    bank budget that forces a shallow split, the suffix carries several
    vgates and an aligned chunk engages a multi-level group ladder —
    the deeper tree-sharing the sup-25 3 GB deep-bank probe showed banks
    cannot buy (northstar_tpu.json: bank paging).  Values must match the
    flat scan exactly at every alignment, including unaligned chunks
    (which must degrade to the per-label ladder, not error)."""
    import jax

    virt = _cut(genCirc("hwe", 10, 3), 6)
    assert len(virt.vgates) >= 3
    flat_step, flat_xs, _ = make_streamed_knit(virt, 36, share_prefix=False)
    flat = np.asarray(jax.jit(flat_step)(flat_xs))

    engaged_multi = False
    for chunk in (36, 72, 32):
        step, xs, meta = make_streamed_knit(
            virt, chunk, share_prefix=True, bank_budget_bytes=1 << 14,
            hoist_banks=True,
        )
        got = np.asarray(jax.jit(step)(xs))
        np.testing.assert_allclose(got, flat, atol=1e-6,
                                   err_msg=f"chunk={chunk}")
        # hoisted-bank call path too
        banks = jax.jit(meta["bank_fn"])()
        got2 = np.asarray(jax.jit(step)(xs, banks))
        np.testing.assert_allclose(got2, flat, atol=1e-6)
        for st in meta["stages"]:
            if st is not None and chunk % meta["stage_align"] == 0:
                if any(t.r_out > 1 for t in st):
                    engaged_multi = True
        if chunk == 32:
            # unaligned: every group degrades to per-label (r_out == 1)
            for st in meta["stages"]:
                if st is not None:
                    assert all(t.r_out == 1 for t in st)
    assert engaged_multi, "aligned chunks never engaged a >1 group ladder"


def test_stage_aligned_chunk_in_run_streamed():
    """An explicitly aligned chunk engages the ancestor-gather dedup in
    run_virtual_circuit_streamed and returns identical values.  (Chunks
    are NOT auto-aligned: the v5e A/B measured staging bandwidth-neutral,
    staged_ab_probe.json.)"""
    virt = _cut(genCirc("hwe", 8, 2), 5)
    _, _, meta = make_streamed_knit(virt, 32, share_prefix=True)
    al = meta["stage_align"]
    assert al > 1  # ancestor-gather dedup is available on this config
    a = run_virtual_circuit_streamed(virt, chunk=4 * al,
                                     share_prefix=True)
    b = run_virtual_circuit_streamed(virt, chunk=32, share_prefix=False)
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), atol=1e-6
    )
