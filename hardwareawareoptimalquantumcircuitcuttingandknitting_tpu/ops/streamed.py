"""Streaming cut-simulate-knit: constant memory for any variant fan-out.

The batched engine (variant_engine + knit) materialises every fragment's
full `[V, 2^k]` result block.  For big cut sets (sup-20: 7776 global
labels; aqft-10: 13824) that block outgrows both HBM budgets and the
tunneled backend's compile-time tolerance (compile scales with buffer
size).  Here the *global* QPD label space is processed in fixed-size
chunks inside one ``lax.scan``:

    carry[d1, ..., dF]  +=  sum_c  prod_f  E_f[c, d_f]

where per chunk each fragment simulates its variants (vmapped), folds its
knit coefficients, and the cross-fragment outer product is accumulated.
One compile, bounded buffers (chunk x 2^k), any fan-out.  This is the
production serving shape: the same scan reruns per shot-batch or
parameter update.

Full-service since r3 (reference parity: qvm/run.py:24-42 runs everything
shot-sampled on noisy backends):

  * ``noise=``: per-fragment NoiseModel — each label simulates T
    Pauli-twirl trajectories (indices streamed as int32 xs, gathered
    against a constant block table on device) and applies the exact
    readout channel per row inside the scan body;
  * ``shots=``: multinomial sampling from the knitted (projected)
    marginal — the streamed analog of the reference's finite-shot counts;
  * ``checkpoint_dir=``: the scan runs in fixed-size segments with the
    carry checkpointed after each — resume mid-scan after interruption.

The chunk axis is also the natural ``dp`` sharding axis on a mesh (shard
the scan's xs, ``psum`` the carry — see parallel/).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logger import get_logger
from ..virt.virtual_circuit import VirtualCircuit
from .bits import permute_bits_flat
from .knit import fold_weights, nearest_probability_distribution
from .statevector import Distribution
from .variant_engine import (
    _slot_tables,
    exec_plan_steps,
    finish_row,
    ideal_stage_align,
    label_strides,
    make_sim_fn,
    make_split_fns,
    split_plan,
    suffix_stages,
    variant_index_table,
)


def _resolve_noise(virt: VirtualCircuit, noise):
    """None | NoiseModel | list-per-fragment -> list per fragment."""
    if noise is None:
        return [None] * len(virt.fragments)
    if isinstance(noise, (list, tuple)):
        assert len(noise) >= len(virt.fragments)
        return list(noise)
    return [noise] * len(virt.fragments)


def _sample_pauli_indices(rng, site_tabs, count: int, traj: int) -> np.ndarray:
    """[count, traj, n_sites] int32 branch indices into each site's own
    Kraus bank (ops/noise._sample_site_blocks semantics, streamed as
    indices to keep the xs small; depolarising sites: 0 = identity,
    1..3 = Pauli; relaxation sites: 0 = no-jump, 1 = decay, 2 = phase
    jump).  The traj axis is BALANCED per (label, site) — systematic
    allocation + independent permutation (ops/noise._site_idx):
    unbiased per trajectory, per-site main-effect variance removed from
    the trajectory mean."""
    from .noise import _site_idx

    s = len(site_tabs)
    if s == 0:
        return np.zeros((count, traj, 0), np.int32)
    return np.stack([
        _site_idx(rng, pr, (count, traj), balance_axis=1)
        for pr, _ in site_tabs
    ], axis=2)


def default_bank_budget(dtype=None) -> int:
    """Per-fragment ancestor-bank budget: 512 MB for f32; 1 GB for the
    bf16 serving mode — a bf16 bank holds twice the ancestors per byte,
    and the measured v5e break-point moved with it (the f32 1.8 GB
    4-level sup-25 bank paged and regressed; the 906 MB bf16 one stays
    resident and wins 1.15x — northstar_tpu.json)."""
    if dtype is not None and np.dtype(dtype).itemsize == 2:
        return 1024 << 20
    return 512 << 20


def _pick_fuse_qubits(virt, name, nm, fused_slots, dtype) -> int:
    """Model-driven fusion width for one fragment: build the plan at
    width 3 and 5 and keep 5 only when the counted per-variant HBM bytes
    drop by >= 8% (the k>3 blocks pay the einsum lowering the <=3q
    slice-combine paths avoid, so a marginal byte win is a wash —
    measured 1.08x at a ~20% byte drop on sup-25 frag0)."""
    if nm is not None:
        return 3  # the noise path keeps the unfused per-gate stream
    from .variant_engine import _steps_hbm_bytes

    sizes = {}
    for fq in (3, 5):
        s, _, _, _ = make_sim_fn(
            virt, name, build_matrices=False, fused_slots=fused_slots,
            dtype=dtype, fuse_qubits=fq,
        )
        sizes[fq], _ = _steps_hbm_bytes(s.run_plan, s.prefix_width)
    return 5 if sizes[5] <= 0.92 * sizes[3] else 3


def make_streamed_knit(
    virt: VirtualCircuit, chunk: int = 512, keep_clbits=None,
    noise=None, trajectories: int | None = None, seed: int = 0,
    z_clbits=None, share_prefix: bool = False,
    bank_budget_bytes: int | None = None, fused_slots: bool = True,
    hoist_banks: bool = False, dtype=None, trunc_eps: float = 0.0,
    fuse_qubits: int | str = "auto",
    pallas_variant: bool = False,
    pallas_staged: bool = True,
):
    """Build (step_fn, xs, meta): ``step_fn(xs)`` scans all global label
    chunks and returns the flat knitted quasi-distribution values.

    Global label order matches the reference enumeration: cartesian
    product over all vgates, last vgate varying fastest
    (qvm/virtual_circuit.py:133-137).

    ``keep_clbits``: marginal knit — data clbits outside the set are
    summed out inside the scan body, so both the per-chunk rows and the
    carry shrink to the marginal's size (this is how 30+ qubit circuits
    knit: the full 2^n distribution never exists anywhere).

    ``noise``: NoiseModel / per-fragment list — trajectory-noise sim with
    exact readout channel per fragment row (see module docstring).  The
    noise path keeps each fragment's op stream UNFUSED (per-physical-gate
    noise sites).

    ``meta`` additionally carries ``carry_shape`` / ``segment_fn`` /
    ``finish_fn`` for segmented (checkpointable) execution:
    ``finish_fn(segment_fn(carry, xs_seg))`` == ``step_fn(xs)`` when the
    segments tile all chunks.

    The scanned ``xs`` carry only per-label *variant indices* (``[n_chunks,
    chunk, num_vgates]`` int32) plus a validity mask (and, for the noise
    path, sampled Pauli indices).  Slot matrices and knit weights live as
    tiny per-instantiation constant tables inside the jitted program and
    are gathered on device — so host memory and host->device traffic scale
    with ``labels x vgates x 4 B`` instead of ``labels x slots x ~384 B``
    (load-bearing on the tunneled TPU and for aqft-16-class fan-outs).

    ``share_prefix``: tree-share each fragment's plan prefix across
    labels (exact path only).  Per fragment a :class:`SplitPlan` picks
    the byte-minimal split: an *ancestor bank* ``[n_anc, 2, 2^m_split]``
    is computed by a first scan (one prefix run per combination of the
    shared vgates' variants), and the label scan gathers ancestor states
    and runs only the plan's suffix — 1.4-1.6x less HBM traffic on the
    north-star configs (PERF.md), full row dedup for fragments touching
    a vgate subset.  The bank is (re)computed inside ``step_fn`` — one
    program, no semantic change; fragments where no split wins (or the
    bank exceeds ``bank_budget_bytes``) keep the flat path.  Noisy
    fragments never share (per-label trajectory sites).

    On top of the bank, the suffix itself is STAGED in-chunk
    (:func:`~.variant_engine.suffix_stages`): because the global label
    order is mixed-radix, consecutive labels share every vgate except a
    trailing set, so each suffix vgate's segment runs once per group of
    ``r_out`` labels and is broadcast to the next stage's finer groups —
    the multi-level tree sharing a deeper bank would buy, without the
    bank memory (the sup-25 3 GB deep-bank probe regressed on paging).
    Staging fully engages when ``chunk`` is a multiple of
    ``meta["stage_align"]`` and degrades exactly to the per-label path
    otherwise.  Measured on the v5e it is BANDWIDTH-NEUTRAL (interleaved
    A/B, staged_ab_probe.json: sup-25 step 5.43 s vs 5.37 s): the bytes
    saved in the mid-segments are offset by lower sustained HBM
    bandwidth at the smaller per-stage batch, so chunks are not
    auto-aligned — the mechanism stays for bytes-limited backends and
    for the ancestor-gather dedup it gives aligned chunks for free.

    ``trunc_eps``: certified approximate knitting (arXiv:2212.01270
    role): drop the lowest-|coefficient-product| global labels while
    their summed contribution bound stays <= trunc_eps — the result
    moves at most ``meta["dropped_mass"]`` (<= trunc_eps) in L1 from
    exact.  Pays off on parametrized cut gates (rzz/cp, cos/sin-skewed
    products); uniform cuts (cx/cz/wire) keep every label until eps
    reaches their common weight.  Exact path only.

    ``hoist_banks``: serving shape — split selection assumes the banks
    are computed ONCE at deploy (``banks = jit(meta["bank_fn"])()``) and
    passed to every call as ``step_fn(xs, banks)``, so the one-time
    build bytes don't count against a split and deeper splits win.
    ``step_fn(xs)`` without ``banks`` still recomputes them in-program
    (same values, just slower per call).
    """
    dtype = jnp.float32 if dtype is None else dtype
    if dtype != jnp.float32:
        assert noise is None, "bf16 serving mode is exact-path only"
    if bank_budget_bytes is None:
        bank_budget_bytes = default_bank_budget(dtype)
    specs = [vg.spec for vg in virt.vgates]
    num_g = len(specs)
    gstride, n_inst, total = label_strides(specs, range(num_g))

    # certified truncation (approximate circuit cutting, arXiv:2212.01270):
    # drop the smallest-|coefficient-product| labels while their summed
    # bound stays <= trunc_eps — the knitted distribution moves by at
    # most trunc_eps in L1.  Parametrized cut gates (rzz/cp) have
    # sharply skewed products; uniform-coefficient cuts (cx/cz/move)
    # drop nothing until eps reaches their common weight.
    kept = None
    dropped_mass = 0.0
    if trunc_eps > 0.0:
        assert noise is None, "truncation is exact-path only"
        from .variant_engine import truncate_labels

        kept, dropped_mass = truncate_labels(
            specs, gstride, n_inst, total, trunc_eps
        )
    n_labels = total if kept is None else len(kept)
    n_chunks = max(1, math.ceil(n_labels / chunk))
    padded = n_chunks * chunk

    valid = (np.arange(padded) < n_labels).astype(np.float32)
    vidx = variant_index_table(
        range(num_g), gstride, n_inst, padded, labels=kept
    )

    models = _resolve_noise(virt, noise)
    rng = np.random.default_rng(seed)

    frag_names = [r.name for r in virt.fragments]
    sim_ones = {}
    slot_tables = []   # per fragment: list of (pre, m4, post) [nI, ...] consts
    slot_gcols = []    # per fragment: vgate column per slot
    w_tables = []      # per fragment: list of [nI, 2] f32 consts (touching)
    xs_pauli = []      # per fragment: [n_chunks, C, T, S] int32 (or [.., 0, 0])
    site_banks = []    # per fragment: [S, 4, 2, 2, 2, 2] Kraus banks or None
    readout = []       # per fragment: 2x2 readout matrix or None
    width_bits = []    # per fragment: #written bits before folding
    fold_plans = []    # per fragment: list of (bit_offset | None)
    data_positions = []
    splits = []  # per fragment: None | (SplitPlan, prefix_one, stages, r_anc)
    pallas_rows = []  # per fragment: None | VMEM-kernel row producer
    pallas_folded = []  # per fragment: kernel output is ALREADY folded
    pallas_kept = {}  # fi -> the folded kernel's kept-clbit layout

    def _chunked(a: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(
            a.reshape((n_chunks, chunk) + a.shape[1:])
        )

    for fi, name in enumerate(frag_names):
        prog = virt.programs[name]
        nm = models[fi]
        frag_fused = fused_slots and nm is None
        # fusion width: "auto" picks 5 over the default 3 when the
        # host byte model predicts a real win for THIS fragment (wider
        # blocks halve passes on deep fixed-gate runs but pay the k>3
        # einsum lowering; measured 1.08x on sup-25 frag0, PERF.md item
        # 3 — now defaulted by prediction instead of left opt-in)
        fq = fuse_qubits
        if fq == "auto":
            fq = _pick_fuse_qubits(virt, name, nm, frag_fused, dtype)
        sim_one, _, positions, _local_count = make_sim_fn(
            virt, name, noise=nm, build_matrices=False,
            fused_slots=frag_fused, dtype=dtype, fuse_qubits=fq,
        )
        sim_ones[name] = sim_one
        slot_tables.append([
            tuple(jnp.asarray(m, dtype=dtype) for m in t)
            for t in _slot_tables(prog, specs, fused=frag_fused)
        ])
        slot_gcols.append([slot.vgate_idx for slot in prog.slots])

        sp = None
        if share_prefix and nm is None:
            # size the split against the labels that actually run
            # (truncation shrinks the per-step work the non-hoisted
            # build-vs-step trade is scored on)
            sp = split_plan(
                sim_one, prog, specs, n_labels, bank_budget_bytes,
                hoisted=hoist_banks,
                state_bytes=np.dtype(dtype).itemsize,
            )
        if sp is None:
            splits.append(None)
        else:
            prefix_one, _ = make_split_fns(sim_one, sp)
            # a truncated label set is not a canonical mixed-radix block
            # sequence, so group ladders are invalid there: chunk=-1
            # fails every r>1 divisibility check and degrades staging to
            # the per-label path (r_anc included)
            stages, r_anc = suffix_stages(
                sp, prog, specs, gstride, chunk if kept is None else -1
            )
            splits.append((sp, prefix_one, stages, r_anc))

        # opt-in whole-variant-in-VMEM kernel (ops/pallas_variant.py):
        # replaces this fragment's per-chunk sim (and its bank/staging —
        # the kernel shares its prefix in VMEM) when the fragment fits.
        # Mosaic compiles are minutes-slow through the tunnel — strictly
        # opt-in, deploy-once (engine="pallas" / make_streamed_knit(
        # pallas_variant=True)).
        pallas_rows.append(None)
        pallas_folded.append(False)
        if (
            pallas_variant and nm is None
            and (dtype is None or np.dtype(dtype).itemsize == 4)
        ):
            from .pallas_variant import (
                make_chunk_kernel,
                make_folded_chunk_kernel,
            )

            # CPU backend: interpret mode (Mosaic is TPU-only) — lets
            # the CPU test suite exercise this exact path
            interp = jax.default_backend() == "cpu"
            # r5 (VERDICT r4 #3): prefer the fold-fused kernel — the
            # vgate-bit folds, drops and z-contractions run IN-KERNEL,
            # the HBM write shrinks to the data-width knit contribution
            # and the scan body's per-vgate fold passes disappear
            # pallas_staged (r5): VMEM per-slot checkpoints — each
            # variant replays only the segments from its first changed
            # slot (A/B knob for benchmarks/pallas_step_ab.py)
            builtf = make_folded_chunk_kernel(
                virt, name, chunk, interpret=interp,
                keep_clbits=keep_clbits, z_clbits=z_clbits,
                staged=pallas_staged,
            )
            if builtf is not None:
                pallas_rows[fi] = builtf[0]
                pallas_folded[fi] = True
                pallas_kept[fi] = builtf[1]
                splits[fi] = None
            else:
                built = make_chunk_kernel(virt, name, chunk,
                                          interpret=interp)
                if built is None:
                    # n > 20: the segmented HBM-resident kernel (r5,
                    # VERDICT r4 #2 — past the VMEM width boundary)
                    from .pallas_blocked import make_blocked_chunk_kernel

                    built = make_blocked_chunk_kernel(
                        virt, name, chunk, interpret=interp
                    )
                if built is not None:
                    rows_fn, pos_pv = built
                    assert pos_pv == list(positions), (pos_pv, positions)
                    pallas_rows[fi] = rows_fn
                    splits[fi] = None

        if nm is None:
            xs_pauli.append(np.zeros((n_chunks, chunk, 0, 0), np.int32))
            site_banks.append(None)
            readout.append(None)
        else:
            traj = trajectories or nm.trajectories
            assert all(
                w is None for (_, _, _, _, w) in sim_one.noise_sites
            ), ("PEC (signed quasi-sites) is batched-engine-only: "
                "run_noisy_virtual_circuit(engine='auto')")
            site_tabs = [
                (pr, bank) for (_, _, pr, bank, _) in sim_one.noise_sites
            ]
            idx = _sample_pauli_indices(rng, site_tabs, padded, traj)
            xs_pauli.append(_chunked(idx))
            # [S, 4, 2, 2, 2, 2] per-site Kraus banks, gathered by the
            # streamed branch indices inside the scan body
            site_banks.append(jnp.asarray(
                np.stack([bank for _, bank in site_tabs])
            ) if site_tabs else jnp.zeros((0, 4, 2, 2, 2, 2), jnp.float32))
            from .noise import frag_clbit_qubits

            cq = dict(frag_clbit_qubits(virt, name))
            if sim_one.readout_device is not None:
                # routed placement: readout rates come from the device
                # node actually holding the bit, matching the gate-noise
                # lookup (and the uncut path's _ro_qubit)
                cq.update({
                    c: d for c, d in sim_one.readout_device.items()
                    if d is not None
                })
            readout.append(np.stack([
                nm.readout_matrix(cq.get(c, j))
                for j, c in enumerate(positions)
            ]) if positions else None)
        width_bits.append(len(positions))

        ws = []
        plan = []
        pos = list(positions)
        k = len(pos)
        frag_weights = fold_weights(virt, name)
        for ti, g in enumerate(prog.touching):
            ws.append(
                (g, jnp.asarray(frag_weights[ti].astype(np.float32)))
            )
            cg = virt.num_clbits + g
            if cg in pos:
                j = pos.index(cg)
                plan.append(("w", j, k))
                pos.pop(j)
                k -= 1
            else:
                plan.append(("w", None, k))
        if z_clbits is not None:
            # observable mode: contract EVERY data bit — signed (+1,-1)
            # on the Z support, summed (+1,+1) elsewhere.  Each fragment
            # reduces to one scalar per label and the carry is a single
            # float: expectation serving at ANY circuit width (the
            # streamed analog of ops/knit.expectation_z).
            for p in list(pos):
                j = pos.index(p)
                plan.append(("z" if p in z_clbits else "drop", j, k))
                pos.pop(j)
                k -= 1
        elif keep_clbits is not None:
            for p in [p for p in pos if p not in keep_clbits]:
                j = pos.index(p)
                plan.append(("drop", j, k))
                pos.pop(j)
                k -= 1
        w_tables.append(ws)
        fold_plans.append(plan)
        data_positions.append(pos)

    for fi, kept in pallas_kept.items():
        # the fold-fused kernel's output layout must equal the XLA fold
        # path's final layout (kept data clbits, ascending)
        assert kept == data_positions[fi], (kept, data_positions[fi])
    shape = tuple(1 << len(p) for p in data_positions)
    # 'z' is the chunk label — fragment labels must not collide with it
    letters = "abdefghijklm"
    assert len(frag_names) <= len(letters)
    expr = (
        ",".join(f"z{letters[i]}" for i in range(len(frag_names)))
        + "->" + letters[: len(frag_names)]
    )


    def _bank_for_fragment(fi):
        """[n_anc_pad, 2, 2^m_split] ancestor states: one prefix run per
        combination of the shared vgates' variants (chunked lax.scan)."""
        sp, prefix_one, _, _ = splits[fi]
        per_anc = (1 << (sp.m_split + 1)) * np.dtype(dtype).itemsize
        achunk = int(max(8, min(sp.n_anc, _CHUNK_BYTES_BUDGET // per_anc)))
        n_ac = math.ceil(sp.n_anc / achunk)
        n_pad = n_ac * achunk
        n_inst_s = {
            g: specs[g].num_instantiations for g in sp.shared
        }
        avidx = jnp.asarray(variant_index_table(
            sp.shared, sp.astrides, n_inst_s, n_pad, clamp_to=sp.n_anc
        ).reshape(n_ac, achunk, len(sp.shared)))
        shared_sids = sorted({
            stp[1] for stp in sp.prefix_steps if stp[0].startswith("slot")
        })
        suffix_sids = {
            stp[1] for stp in sp.suffix_steps if stp[0].startswith("slot")
        }
        # slot-step groups are contiguous, so no slot straddles the split
        assert not (set(shared_sids) & suffix_sids), (shared_sids, suffix_sids)
        col_of = {g: j for j, g in enumerate(sp.shared)}

        def abody(_, av):
            mats = {
                sid: tuple(
                    t[av[:, col_of[slot_gcols[fi][sid]]]]
                    for t in slot_tables[fi][sid]
                )
                for sid in shared_sids
            }
            return None, jax.vmap(prefix_one)(mats)

        _, ys = jax.lax.scan(abody, None, avidx)
        return ys.reshape(n_pad, 2, 1 << sp.m_split)

    def _compute_banks():
        return tuple(
            _bank_for_fragment(fi) if splits[fi] is not None
            else jnp.zeros((0,), jnp.float32)
            for fi in range(len(frag_names))
        )

    def _rows_for_fragment(fi, name, vidx_chunk, pidx, bank=None):
        sim_one = sim_ones[name]
        if pallas_rows[fi] is not None:
            return pallas_rows[fi](vidx_chunk)
        if splits[fi] is not None:
            # staged suffix: each stage runs once per group of r_out
            # consecutive labels (suffix_stages — in-chunk tree sharing),
            # broadcasting representatives down to the next stage's
            # finer groups.  With every r_out == 1 this is exactly the
            # per-label suffix path.
            sp, _, stages, r_anc = splits[fi]
            masks = getattr(sim_one, "slot_masks", None)
            reps0 = vidx_chunk[::r_anc]
            anc = jnp.zeros((chunk // r_anc,), jnp.int32)
            for g in sp.shared:
                anc = anc + reps0[:, g] * jnp.int32(sp.astrides[g])
            states = bank[anc]
            cur = r_anc
            m_fin = sp.m_split
            for st in stages:
                if st.r_out != cur:
                    k = cur // st.r_out
                    s0 = states.shape
                    states = jnp.broadcast_to(
                        states[:, None], (s0[0], k) + s0[1:]
                    ).reshape((s0[0] * k,) + s0[1:])
                    cur = st.r_out
                reps = vidx_chunk[::cur]
                mats = {
                    sid: tuple(
                        t[reps[:, slot_gcols[fi][sid]]]
                        for t in slot_tables[fi][sid]
                    )
                    for sid in st.sids
                }

                def seg_fn(s, mm, _steps=st.steps, _m=st.m_in):
                    return exec_plan_steps(
                        s, _m, _steps, mm, slot_masks=masks
                    )[0]

                states = jax.vmap(seg_fn)(states, mats)
                m_fin = st.m_in + sum(
                    1 for stp in st.steps if stp[0] == "ins"
                )
            if cur != 1:
                s0 = states.shape
                states = jnp.broadcast_to(
                    states[:, None], (s0[0], cur) + s0[1:]
                ).reshape((s0[0] * cur,) + s0[1:])

            def fin(s, _m=m_fin):
                return finish_row(
                    s, _m, sim_one.active_final, sim_one.sources
                )

            return jax.vmap(fin)(states)
        # device-side gather: per-label variant index -> slot matrices
        mats = [
            tuple(t[vidx_chunk[:, g]] for t in tabs)
            for g, tabs in zip(slot_gcols[fi], slot_tables[fi])
        ]
        if models[fi] is None:
            if mats:
                return jax.vmap(sim_one)(mats)
            row = sim_one([])
            return jnp.broadcast_to(row, (chunk, row.shape[0]))
        # trajectory noise: pidx [chunk, T, S]; average rows over T.
        # Each site gathers its branch block from its OWN Kraus bank
        # (depolarising or thermal-relaxation — ops/noise.gate_noise_sites)
        sbank = site_banks[fi]

        def one_traj(m, pt):
            return sim_one(m, sbank[jnp.arange(sbank.shape[0]), pt])

        if mats:
            rows = jax.vmap(
                lambda m, pv: jnp.mean(
                    jax.vmap(lambda pt: one_traj(m, pt))(pv), axis=0
                )
            )(mats, pidx)
        else:
            rows = jax.vmap(
                lambda pv: jnp.mean(
                    jax.vmap(lambda pt: one_traj([], pt))(pv), axis=0
                )
            )(pidx)
        # exact readout channel on this fragment's written bits
        if readout[fi] is not None:
            ms = jnp.asarray(readout[fi])  # [k, 2, 2] per-bit calibrated
            k = width_bits[fi]
            for j in range(k):
                high, low = 1 << (k - 1 - j), 1 << j
                r4 = rows.reshape(chunk, high, 2, low)
                rows = jnp.einsum(
                    "ab,chbl->chal", ms[j], r4
                ).reshape(chunk, -1)
        return rows

    def body(carry, x, banks=None):
        vidx_chunk, pauli_chunks, valid_chunk = x
        es = []
        for fi, name in enumerate(frag_names):
            rows = _rows_for_fragment(
                fi, name, vidx_chunk, pauli_chunks[fi],
                None if banks is None else banks[fi],
            )
            if pallas_folded[fi]:
                # fold-fused kernel: rows arrive already weight-folded,
                # dropped and z-contracted (make_folded_chunk_kernel)
                es.append(rows)
                continue
            w_iter = iter(w_tables[fi])
            for kind, j, k in fold_plans[fi]:
                if kind == "drop":
                    high, low = 1 << (k - 1 - j), 1 << j
                    rows = rows.reshape(chunk, high, 2, low).sum(axis=2)
                    rows = rows.reshape(chunk, -1)
                    continue
                if kind == "z":
                    high, low = 1 << (k - 1 - j), 1 << j
                    r4 = rows.reshape(chunk, high, 2, low)
                    rows = (r4[:, :, 0, :] - r4[:, :, 1, :]).reshape(
                        chunk, -1
                    )
                    continue
                g, w_tab = next(w_iter)
                w_sel = w_tab[vidx_chunk[:, g]]
                if j is not None:
                    high, low = 1 << (k - 1 - j), 1 << j
                    rows = rows.reshape(chunk, high, 2, low)
                    rows = jnp.einsum(
                        "chbl,cb->chl", rows, w_sel
                    ).reshape(chunk, -1)
                else:
                    rows = rows * w_sel[:, :1]
            es.append(rows)
        es[0] = es[0] * valid_chunk[:, None]
        return carry + jnp.einsum(expr, *es), None

    any_split = any(s is not None for s in splits)

    def segment_fn(carry, xs_seg, banks=None):
        if banks is None and any_split:
            banks = _compute_banks()
        out, _ = jax.lax.scan(
            lambda c, x: body(c, x, banks), carry, xs_seg
        )
        return out

    def finish_fn(carry):
        # interleave fragment bit groups to global ascending clbit order
        src_bits: list[int] = []
        for pos_list in reversed(data_positions):
            src_bits.extend(pos_list)
        return permute_bits_flat(
            carry.reshape(-1), src_bits, sorted(src_bits)
        )

    def step_fn(xs, banks=None):
        carry0 = jnp.zeros(shape, dtype=jnp.float32)
        return finish_fn(segment_fn(carry0, xs, banks))

    xs = (_chunked(vidx), xs_pauli, _chunked(valid))
    meta = {
        "positions": sorted(
            p for pos_list in data_positions for p in pos_list
        ),
        "global_labels": total,
        "kept_labels": n_labels,
        "dropped_mass": dropped_mass,
        "n_chunks": n_chunks,
        "chunk": chunk,
        "carry_shape": shape,
        "segment_fn": segment_fn,
        "finish_fn": finish_fn,
        "bank_fn": _compute_banks if any_split else None,
        "splits": [s[0] if s is not None else None for s in splits],
        "stages": [s[2] if s is not None else None for s in splits],
        # which fragments the VMEM kernel actually backs (advisor r4:
        # an opted-in engine="pallas" run must not silently degrade to
        # the XLA sim with no runtime signal)
        "pallas_fragments": {
            name: pallas_rows[fi] is not None
            for fi, name in enumerate(frag_names)
        },
    }
    if pallas_variant:
        routed = [n for n, ok in meta["pallas_fragments"].items() if ok]
        fell_back = [
            n for n, ok in meta["pallas_fragments"].items() if not ok
        ]
        log = get_logger(__name__)
        log.info(
            f"engine='pallas': VMEM kernel backs {routed or 'NO'} "
            f"fragment(s); XLA sim fallback for {fell_back or 'none'}"
        )
        if not routed:
            log.warning(
                "engine='pallas' had no effect: every fragment is "
                "outside the kernel gates (8..20 VMEM, 21..24 blocked; "
                "exact f32) — the scan runs entirely on the XLA sim"
            )
    # the chunk multiple at which in-chunk suffix staging engages fully
    # (lcm over fragments of the stride-valid coarsest group size).
    # Informational: chunks are NOT auto-aligned — the v5e A/B measured
    # staging bandwidth-neutral (staged_ab_probe.json); a caller on a
    # bytes-limited backend can pass an aligned chunk to engage it
    # truncated label sets are never canonical blocks, so no chunk can
    # engage staging there — advertise 1, not the untruncated ideal
    align = 1
    if kept is None:
        for fi, s in enumerate(splits):
            if s is not None:
                a = ideal_stage_align(
                    s[0], virt.programs[frag_names[fi]], specs, gstride
                )
                align = align * a // math.gcd(align, a)
    meta["stage_align"] = align
    return step_fn, xs, meta


# Per-buffer budget for the scan body's [chunk, 2, 2^n] intermediates.
# XLA keeps ~10 gate intermediates live at once; measured on v5e
# (15.75 GB usable): chunk=1024 at 2^18 sim qubits (2 GB/buffer) OOMs at
# 20 GB, chunk=512 (1 GB/buffer) runs fine — 512 MB/buffer leaves 2x
# headroom.  The budget deliberately sizes elements at f32 even for the
# bf16 serving mode: a bf16 sup-25 probe at chunk 512 (the bf16-sized
# cap) measured 2.82 s vs 2.33 s at the f32-sized chunk 256 — larger
# scan batches hurt past the bandwidth saturation point, so the
# conservative cap is also the faster one.
_CHUNK_BYTES_BUDGET = 512 * 1024 * 1024


def auto_chunk(
    virt: VirtualCircuit, requested: int, trajectories: int = 1,
    noisy: bool = False,
) -> int:
    max_n = max(
        (p.num_sim_qubits for p in virt.programs.values()), default=1
    )
    per_variant = 2 * (1 << max_n) * 4 * max(1, trajectories)
    budget = _CHUNK_BYTES_BUDGET
    if noisy or trajectories > 1:
        # the noise path keeps the op stream UNFUSED (per-gate noise
        # sites), so XLA holds several chunk-sized intermediates live at
        # once; a 512 MB-per-buffer budget crashed the v5e worker on
        # sup-20 x 8 trajectories — keep noisy buffers <= 64 MB
        budget //= 8
    cap = max(8, budget // per_variant)
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    # never pad a small fan-out up to a huge chunk of masked-out labels
    return int(max(1, min(requested, cap, total)))


# ---------------------------------------------------------------------------
# Segmented (checkpointable) execution
# ---------------------------------------------------------------------------

_STREAM_CKPT = "stream_carry.npz"


def _stream_fingerprint(virt, chunk, segment_chunks, models, trajectories,
                        seed, dtype=None, trunc_eps: float = 0.0,
                        keep_clbits=None) -> str:
    import hashlib

    from ..utils.checkpoint import checkpoint_fingerprint

    import numpy as _np

    h = hashlib.sha256()
    h.update(checkpoint_fingerprint(virt, dtype=dtype).encode())
    h.update(f"|chunk={chunk}|seg={segment_chunks}|seed={seed}".encode())
    if trunc_eps:
        # a truncated run's carry covers a different label subset — it
        # must never be resumed by an exact (or differently-truncated) run
        h.update(f"|trunc_eps={trunc_eps!r}".encode())
    if keep_clbits is not None:
        # a marginal run's carry has marginal width/layout — never resume
        # across different keep sets (or from/into a full-width run)
        h.update(f"|keep={sorted(keep_clbits)}".encode())
    for nm in models:
        if nm is None:
            h.update(b"none")
            continue
        h.update(
            f"{nm.name}|{nm.p1}|{nm.p2}|{nm.readout01}|{nm.readout10}|"
            f"{trajectories or nm.trajectories}|{nm.untranspiled}|"
            f"{sorted(map(tuple, nm.coupling)) if nm.coupling else None}"
            .encode()
        )
        # thermal-relaxation calibration (scalars + gate durations):
        # models differing only in T1/T2 must not share a checkpoint
        h.update(
            f"|t1={nm.t1}|t2={nm.t2}|g1={nm.gate_time_1q}"
            f"|g2={nm.gate_time_2q}".encode()
        )
        # per-qubit calibration vectors: two models sharing name/scalars
        # but different vectors must not share a checkpoint
        for vec in (nm.p1_q, nm.p2_q, nm.ro01_q, nm.ro10_q, nm.t1_q,
                    nm.t2_q):
            if vec is None:
                h.update(b"|none")
            else:
                a = _np.ascontiguousarray(_np.asarray(vec, _np.float64))
                h.update(b"|" + a.tobytes())
    return h.hexdigest()


def _load_stream_checkpoint(directory, fingerprint, carry_shape):
    import pathlib

    path = pathlib.Path(directory) / _STREAM_CKPT
    if not path.exists():
        return None, 0
    data = np.load(path, allow_pickle=False)
    if str(data["fingerprint"]) != fingerprint:
        return None, 0
    carry = data["carry"]
    if carry.shape != tuple(carry_shape):
        return None, 0
    return carry, int(data["next_segment"])


def _save_stream_checkpoint(directory, fingerprint, carry, next_segment):
    import os
    import pathlib

    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    tmp = directory / (_STREAM_CKPT + ".tmp")
    np.savez(
        tmp, carry=carry, next_segment=next_segment, fingerprint=fingerprint
    )
    # np.savez appends .npz to a name without it; handle both layouts
    src = tmp if tmp.exists() else tmp.with_suffix(".tmp.npz")
    os.replace(src, directory / _STREAM_CKPT)


def run_virtual_circuit_streamed(
    virt: VirtualCircuit,
    chunk: int = 512,
    project: bool = False,
    noise=None,
    trajectories: int | None = None,
    shots: int | None = None,
    seed: int = 0,
    checkpoint_dir=None,
    segment_chunks: int | None = None,
    share_prefix: bool | None = None,
    dtype=None,
    trunc_eps: float = 0.0,
    keep_clbits=None,
    pallas_variant: bool = False,
) -> Distribution:
    """End-to-end streamed execution on the default device.  ``chunk`` is
    capped by :func:`auto_chunk` to bound device memory.

    ``checkpoint_dir``: run the scan in segments of ``segment_chunks``
    chunks, saving the accumulator after each — a rerun with the same
    arguments resumes at the first unfinished segment (stale or
    mismatching checkpoints are ignored via fingerprint).

    ``shots``: multinomial-sample the knitted distribution (projected
    first).  Unlike the batched engines — which sample each fragment's
    variant rows like the reference's per-instantiation Aer counts — the
    streamed path samples the *final* marginal: per-fragment rows never
    materialise here.  Statistically both emulate finite-shot estimation.
    Without ``checkpoint_dir``, the Smolin projection and the sampling
    run ON DEVICE fused into the scan program and only the [shots] int32
    outcome indices are fetched — on the tunneled TPU a dense 2^25-float
    fetch costs ~minutes while the sampled fetch is free, so this is the
    shot-serving shape (the reference likewise returns counts, not the
    dense vector: qvm/run.py:42-58).

    ``share_prefix``: tree-share plan prefixes across labels (see
    :func:`make_streamed_knit`).  Default (None) = on; per-fragment the
    split only engages where the byte model says it wins, and noisy
    fragments always run flat.

    ``dtype``: statevector storage dtype.  ``jnp.bfloat16`` is the
    quantized serving mode — every state pass (and the ancestor banks)
    moves half the HBM bytes while probabilities, folds and the knit
    stay f32.  Per-amplitude rounding is ~2^-8 per pass; use with
    ``shots`` where sampling noise dominates (the exact-fidelity
    contract is the f32 default).  Exact path only.

    ``keep_clbits``: marginal knit (see :func:`make_streamed_knit`) —
    the carry, the fetch, and any ``shots`` sampling all live on the
    marginal; the full 2^n distribution never exists anywhere (the
    30+ qubit serving mode, e.g. benchmarks/syc32_demo.py).
    """
    models = _resolve_noise(virt, noise)
    traj_eff = max(
        [trajectories or nm.trajectories for nm in models if nm is not None],
        default=1,
    )
    # the /8 noisy buffer budget applies only if some fragment actually
    # runs the unfused trajectory body — a list of all-None models (the
    # untranspiled reference-parity path) is the exact fused path
    chunk = auto_chunk(
        virt, chunk, traj_eff, noisy=any(m is not None for m in models)
    )
    step_fn, xs, meta = make_streamed_knit(
        virt, chunk, keep_clbits=keep_clbits,
        noise=noise, trajectories=trajectories, seed=seed,
        share_prefix=share_prefix if share_prefix is not None else True,
        dtype=dtype, trunc_eps=trunc_eps, pallas_variant=pallas_variant,
    )
    # NOTE: the chunk is NOT auto-rounded to meta["stage_align"].  The
    # staged suffix engages when the caller's chunk is already aligned;
    # the interleaved A/B on the v5e (staged_ab_probe.json: sup-25
    # 5.43 s vs 5.37 s scalar-fetch steady) showed byte dedup is offset
    # by lower sustained bandwidth at the smaller mid-segment batch, so
    # shrinking a chunk to force alignment buys nothing on this device.
    n_chunks = meta["n_chunks"]

    if checkpoint_dir is None and shots is not None:
        from .sampling import sample_indices_device, smolin_project_traced

        def serve(xs):
            flat = step_fn(xs)
            proj = smolin_project_traced(flat)
            key = jax.random.PRNGKey(seed)
            return sample_indices_device(proj, shots, key), jnp.sum(proj)

        idx, mass = jax.jit(serve)(xs)
        if float(mass) <= 0.0:
            raise ValueError(
                "cannot sample from an all-nonpositive distribution"
            )
        idx = np.asarray(idx)
        width = 1 << len(meta["positions"])
        counts = np.bincount(idx, minlength=width) / float(shots)
        return Distribution(
            counts.astype(np.float32), meta["positions"], virt.num_clbits
        )

    if checkpoint_dir is None:
        values = np.asarray(jax.jit(step_fn)(xs))
    else:
        seg = segment_chunks or max(1, min(n_chunks, 16))
        nseg = math.ceil(n_chunks / seg)
        pad = nseg * seg - n_chunks
        if pad:
            # padded chunks carry valid=0, so their contribution is masked
            xs = jax.tree.map(
                lambda a: np.concatenate(
                    [a, np.zeros((pad,) + a.shape[1:], a.dtype)]
                ),
                xs,
            )
        fp = _stream_fingerprint(
            virt, chunk, seg, models, trajectories, seed, dtype=dtype,
            trunc_eps=trunc_eps, keep_clbits=keep_clbits,
        )
        carry, start = _load_stream_checkpoint(
            checkpoint_dir, fp, meta["carry_shape"]
        )
        if carry is None:
            carry = np.zeros(meta["carry_shape"], np.float32)
            start = 0
        if meta["bank_fn"] is not None:
            # compute the ancestor banks ONCE per process — per-segment
            # recompute would re-pay the shared prefix nseg times
            banks = jax.jit(meta["bank_fn"])()
            segment = jax.jit(meta["segment_fn"])
        else:
            banks = None
            segment = jax.jit(meta["segment_fn"])
        for si in range(start, nseg):
            xs_seg = jax.tree.map(
                lambda a: a[si * seg:(si + 1) * seg], xs
            )
            carry = np.asarray(
                segment(carry, xs_seg) if banks is None
                else segment(carry, xs_seg, banks)
            )
            _save_stream_checkpoint(checkpoint_dir, fp, carry, si + 1)
        values = np.asarray(jax.jit(meta["finish_fn"])(carry))

    dist = Distribution(values, meta["positions"], virt.num_clbits)
    if project or shots is not None:
        dist = nearest_probability_distribution(dist)
    if shots is not None:
        from .sampling import sample_distribution

        dist = sample_distribution(dist, shots, seed)
    return dist


def streamed_expectation_z(
    virt: VirtualCircuit, z_clbits, chunk: int = 512,
    noise=None, trajectories: int | None = None, seed: int = 0,
    share_prefix: bool = True, dtype=None,
    pallas_variant: bool = False,
) -> float:
    """<prod_{c in z_clbits} Z_c> of the reconstructed distribution,
    computed with a SCALAR carry: every data bit is contracted inside the
    scan body (signed on the Z support), so no distribution of any size
    materialises for any circuit width — the streamed twin of
    ``ops.knit.expectation_z`` (constant memory in both the label count
    and the qubit count; one scalar fetch).

    ``noise``: optional NoiseModel / per-fragment list — the observable
    of the trajectory-noise + readout-channel estimate (same engine as
    the noisy streamed distribution path)."""
    # every Z support bit must be WRITTEN by a measure — an unmeasured
    # clbit would silently contract as (+1,+1) and report 1.0 (zoo
    # circuits without terminal measures are the common trap)
    written = {
        c for p in virt.programs.values() for c in p.clbit_sources
        if c < virt.num_clbits
    }
    missing = set(z_clbits) - written
    if missing:  # ValueError, not assert: must survive ``python -O``
        raise ValueError(
            f"z_clbits {sorted(missing)} are never measured "
            f"(written data clbits: {sorted(written)})"
        )
    models = _resolve_noise(virt, noise)
    traj_eff = max(
        [trajectories or nm.trajectories for nm in models if nm is not None],
        default=1,
    )
    chunk = auto_chunk(
        virt, chunk, traj_eff, noisy=any(m is not None for m in models)
    )
    step_fn, xs, meta = make_streamed_knit(
        virt, chunk, z_clbits=frozenset(z_clbits),
        noise=noise, trajectories=trajectories, seed=seed,
        share_prefix=share_prefix, dtype=dtype,
        pallas_variant=pallas_variant,
    )
    return float(np.asarray(jax.jit(step_fn)(xs)).reshape(()))
