"""Batched execution of all QPD variants of a fragment.

The TPU replacement for Aer's per-instantiation jobs (qvm/run.py:36-42): the
fragment's static program is traced once and ``vmap``-ed over the variant
axis; per-variant endpoint behaviour enters purely through data (slot
matrices), so shapes are static and XLA compiles a single kernel for the
whole 6^g * 8^w fan-out.  Large fan-outs are chunked to bound memory.

The per-variant program is a *lazy plan* (built in :func:`make_sim_fn`):
qubits are introduced at the start of the slot-delimited segment of
their first op (deferral ancillas cost nothing until mid-circuit), the
variant-independent prefix is executed once on the host and shared as a
constant, fixed-gate runs are fused (ops/fusion.py), and trajectory
noise sites are explicit plan steps at the width of their op.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.gates import COMPLEX, CX
from ..virt.tables import VGateSpec
from ..virt.virtual_circuit import FragmentProgram, VirtualCircuit
from .statevector import (
    Distribution,
    apply_matrix,
    marginalize_flat,
    to_real_block,
)

_I4 = np.eye(4, dtype=COMPLEX)


def pad_variants(leaves, total: int, padded: int):
    """Pad every array in a pytree from ``total`` to ``padded`` rows by
    repeating the last row (padding rows are sliced off after the run)."""
    if padded == total:
        return leaves
    return jax.tree.map(
        lambda m: np.concatenate(
            [np.asarray(m), np.repeat(np.asarray(m)[-1:], padded - total, 0)]
        ),
        leaves,
    )


def scan_variant_rows(sim_fn, arg_trees: tuple, total: int, chunk: int):
    """Run ``sim_fn(*args)`` for every variant row in ONE dispatch.

    ``arg_trees``: tuple of pytrees, each with arrays of leading dim
    ``total`` (positional args of ``sim_fn`` per variant).  Pads to a
    multiple of ``chunk``, reshapes to ``[n_chunks, chunk, ...]`` and
    ``lax.scan``s a vmapped body — a host-side chunk loop pays a
    dispatch+fetch round-trip per chunk, measured 8.5x slower end-to-end
    on the v5e (BENCH_TABLE_TPU.md, r3 shootout).  Returns ``[total,
    width]`` rows (host numpy)."""
    n_chunks = math.ceil(total / chunk)
    padded = n_chunks * chunk
    args = pad_variants(arg_trees, total, padded)
    if n_chunks == 1:
        return np.asarray(
            jax.jit(jax.vmap(sim_fn))(
                *jax.tree.map(np.asarray, args)
            )
        )[:total]
    xs = jax.tree.map(
        lambda m: np.ascontiguousarray(
            np.asarray(m).reshape((n_chunks, chunk) + np.asarray(m).shape[1:])
        ),
        args,
    )

    def _body(carry, x):
        return carry, jax.vmap(sim_fn)(*x)

    @jax.jit
    def _run(xs):
        _, ys = jax.lax.scan(_body, None, xs)
        return ys.reshape(padded, ys.shape[-1])

    return np.asarray(_run(xs))[:total]


def chunk_cap(num_sim_qubits: int) -> int:
    """Per-scan-step variant cap.  On the tunneled TPU, server-side
    compile time scales with the largest buffer in the program, so keep
    chunk * 2^n <= 2^20 floats (verify SKILL.md); on CPU the compile is
    local and cached, and tiny chunks just multiply dispatch overhead."""
    if jax.default_backend() == "cpu":
        return max(1, (1 << 23) >> num_sim_qubits)
    return max(1, (1 << 19) >> num_sim_qubits)


def _stack_blocks(mats: np.ndarray) -> np.ndarray:
    """[V, m, m] complex -> [V, 2, m, 2, m] real blocks."""
    return np.stack([to_real_block(m) for m in mats])


@dataclass
class FragmentResult:
    name: str
    values: np.ndarray           # [num_variants, 2^k] float32
    bit_positions: list[int]     # global clbit per local bit (ascending)
    touching: list[int]          # global vgate indices (variant axes, last
                                 # fastest — reference label order)


def _slot_tables(
    prog: FragmentProgram, specs: list[VGateSpec], fused: bool = False,
) -> list[tuple[np.ndarray, ...]]:
    """Per-slot (pre[nI,...], meas4[nI,...], post[nI,...]) real-block
    variant tables — one row per instantiation of the slot's vgate.

    These are the *un-gathered* building blocks: the batched path gathers
    them per flat variant index on the host (:func:`_slot_matrices`), the
    streamed path embeds them as jit constants and gathers per-label
    variant indices on device (host->device traffic and host memory then
    scale with #labels x #vgates x 4 bytes instead of #labels x #slots x
    ~384 bytes).

    ``fused=True``: ONE composed block per slot — ``(post x I) @ meas4 @
    (pre x I)`` on (endpoint qubit, deferral ancilla) for measuring
    slots, ``post @ pre`` otherwise — returned as 1-tuples.  Matches the
    single "slot" plan step :func:`make_sim_fn` emits with
    ``fused_slots=True``: 3 HBM passes per slot become 1 (slot passes
    carry 20-91% of per-variant traffic on the baseline configs)."""
    out = []
    for slot in prog.slots:
        spec = specs[slot.vgate_idx]
        pres = np.stack([p[slot.side].pre for p in spec.endpoints])
        posts = np.stack([p[slot.side].post for p in spec.endpoints])
        meas = np.array(
            [p[slot.side].measure for p in spec.endpoints], dtype=np.float32
        )
        m4 = (
            meas[:, None, None] * CX[None]
            + (1.0 - meas[:, None, None]) * _I4[None]
        ).astype(COMPLEX)
        if fused:
            if slot.ancilla is not None:
                i2 = np.eye(2, dtype=COMPLEX)
                comp = np.stack([
                    np.kron(posts[i], i2) @ m4[i] @ np.kron(pres[i], i2)
                    for i in range(len(pres))
                ])
            else:
                comp = np.stack([
                    posts[i] @ pres[i] for i in range(len(pres))
                ])
            out.append((_stack_blocks(comp),))
            continue
        out.append(
            (_stack_blocks(pres), _stack_blocks(m4), _stack_blocks(posts))
        )
    return out


def _slot_matrices(
    prog: FragmentProgram, specs: list[VGateSpec], flat_count: int,
    strides: dict[int, int], n_inst: dict[int, int], fused: bool = False,
) -> list[tuple[np.ndarray, ...]]:
    """Per-slot (pre[V,2,2], meas4[V,4,4], post[V,2,2]) gathered per flat
    variant index (1-tuples of composed blocks with ``fused=True``)."""
    out = []
    flat = np.arange(flat_count)
    tables = _slot_tables(prog, specs, fused=fused)
    for slot, tabs in zip(prog.slots, tables):
        v_idx = (flat // strides[slot.vgate_idx]) % n_inst[slot.vgate_idx]
        out.append(tuple(t[v_idx] for t in tabs))
    return out


def label_strides(
    specs, touching,
) -> tuple[dict[int, int], dict[int, int], int]:
    """(strides, n_inst, flat_count) for a fragment's touching vgates:
    last-vgate-fastest label order (reference qvm/virtual_circuit.py:
    133-137).

    The single implementation of the label->variant-index stride
    convention — make_sim_fn, the sweep binder (ops/sweep.py) and the
    dp x tp knit step (parallel/sharded.py) all call this; the
    convention must never fork across engines."""
    n_inst = {g: specs[g].num_instantiations for g in touching}
    strides: dict[int, int] = {}
    flat_count = 1
    for g in reversed(list(touching)):
        strides[g] = flat_count
        flat_count *= n_inst[g]
    return strides, n_inst, flat_count


def variant_index_table(
    order, strides: dict[int, int], n_inst: dict[int, int],
    padded: int, clamp_to: int | None = None,
    labels: np.ndarray | None = None,
) -> np.ndarray:
    """[padded, max(1, len(order))] int32 per-label variant indices:
    column i holds ``(label // strides[order[i]]) % n_inst[order[i]]``.

    The ONE place that pins the label->variant-index convention
    (last-vgate-fastest strides, reference order qvm/virtual_circuit.py:
    133-137) for every engine that gathers slot tables on device
    (streamed scan, sharded-fragment, dp x tp knit step).  ``clamp_to``
    clamps padding labels to the last real one (equivalent to repeating
    the final variant row).  ``labels``: explicit label ids instead of
    ``arange(padded)`` — the truncated-label path (rows beyond its
    length repeat the last id; masked by the caller's validity).  Host
    arithmetic runs in int64, the stored column is a small int32."""
    if labels is None:
        labels = np.arange(padded)
    else:
        labels = np.asarray(labels, dtype=np.int64)
        if len(labels) < padded:
            pad_val = labels[-1] if len(labels) else 0
            labels = np.concatenate(
                [labels, np.full(padded - len(labels), pad_val)]
            )
    if clamp_to is not None:
        labels = np.minimum(labels, clamp_to - 1)
    order = list(order)
    out = np.zeros((padded, max(1, len(order))), np.int32)
    for i, g in enumerate(order):
        out[:, i] = labels // strides[g] % n_inst[g]
    return out


def label_weight_bounds(specs, gstride: dict, n_inst: dict,
                        total: int) -> np.ndarray:
    """[total] certified per-label contribution bounds: the L1 change of
    the knitted distribution from dropping label ``l`` is at most
    ``prod_g max_b |coef_g[v_g(l), b]|`` — each fragment's conditional
    rows carry unit mass, so the per-vgate fold is bounded by its
    largest-|coefficient| outcome.  Basis of the certified truncation
    mode (approximate circuit cutting, arXiv:2212.01270): parametrized
    cut gates (rzz/cp — virt/tables.py cos/sin coefficients) make this
    product sharply skewed, so most labels carry negligible weight."""
    w = np.ones(total, dtype=np.float64)
    lab = np.arange(total, dtype=np.int64)
    for g, spec in enumerate(specs):
        wg = np.max(np.abs(np.asarray(spec.coef, np.float64)), axis=1)
        w *= wg[(lab // gstride[g]) % n_inst[g]]
    return w


def truncate_labels(specs, gstride: dict, n_inst: dict, total: int,
                    eps: float) -> tuple[np.ndarray, float]:
    """(kept label ids ascending, certified dropped L1 mass): drop the
    smallest-bound labels while their cumulative bound stays <= eps.
    At least one label is always kept."""
    w = label_weight_bounds(specs, gstride, n_inst, total)
    order = np.argsort(w, kind="stable")
    csum = np.cumsum(w[order])
    n_drop = int(np.searchsorted(csum, eps, side="right"))
    n_drop = min(n_drop, total - 1)
    kept = np.sort(order[n_drop:])
    dropped = float(csum[n_drop - 1]) if n_drop else 0.0
    return kept, dropped


def collapse_qubit(state, q: int, m: int, u, mflag, w0, w1):
    """Mid-circuit measure-and-collapse of qubit ``q`` on a flat real-rep
    ``[2, 2^m]`` state — the sampled-measurement alternative to the
    deferred-measurement ancilla (which costs a qubit per measuring cut:
    qft-16's 15|1 split would need 2^30 sim states on the ancilla path).

    ``u`` ~ U(0,1) picks the branch at its Born probability; the branch
    is projected and rescaled by sqrt(total/p_b) so the returned
    per-sample weight ``w_b`` makes ``E[w_b * |psi_b|^2] =
    sum_b w_b |P_b psi|^2`` exactly (importance sampling at the Born
    distribution — the textbook full-QPD-sampling execution, where each
    sample runs ONE mid-circuit-measured instance).  ``mflag`` gates the
    whole step per variant (non-measuring variants pass through with
    weight 1).  All branch-free: vmap/jit-safe."""
    st = state.reshape(2, 1 << q, 2, 1 << (m - 1 - q))
    sq = st.astype(jnp.float32)
    sq = sq * sq
    p0 = jnp.sum(sq[:, :, 0, :])
    p1 = jnp.sum(sq[:, :, 1, :])
    tot = p0 + p1
    b = (u * tot >= p0).astype(jnp.float32)  # 0/1 branch pick
    pb = p0 + b * (p1 - p0)
    scale = jnp.sqrt(tot / jnp.maximum(pb, 1e-30)).astype(state.dtype)
    keep = jnp.stack([1.0 - b, b]).astype(state.dtype)
    projected = st * keep[None, None, :, None] * scale
    out = jnp.where(mflag > 0, projected.reshape(2, -1), state)
    weight = jnp.where(mflag > 0, w0 + b * (w1 - w0), 1.0)
    return out, weight


def exec_plan_steps(state, m, steps, slot_mats, pauli_mats=None,
                    slot_masks=None, collapse_args=None):
    """Run a slice of a fragment's lazy execution plan (the step list
    built by :func:`make_sim_fn`) on a flat real-rep ``[2, 2^m]`` state.
    ``slot_mats`` maps slot id -> (pre, m4, post) real blocks (list or
    dict — plans index it by slot id).  ``slot_masks`` (slot id -> union
    nonzero pattern of the slot's fused table) routes fused slot blocks
    through the masked slice-combine apply.  Returns ``(state, m)`` —
    or ``(state, m, weight)`` when ``collapse_args`` is given (slot id
    -> (u, mflag, w0, w1) per-variant scalars for the plan's "collapse"
    steps; see :func:`collapse_qubit`)."""
    weight = None if collapse_args is None else jnp.float32(1.0)
    for stp in steps:
        kind = stp[0]
        if kind == "ins":
            pos = stp[1]
            r = state.reshape(2, 1 << pos, 1 << (m - pos))
            state = jnp.stack(
                [r, jnp.zeros_like(r)], axis=2
            ).reshape(2, 1 << (m + 1))
            m += 1
        elif kind == "u":
            state = apply_matrix(state, stp[1], stp[2], m)
        elif kind == "pauli":
            if pauli_mats is not None:
                state = apply_matrix(state, pauli_mats[stp[1]], stp[2], m)
        elif kind == "collapse":
            u, mflag, w0, w1 = collapse_args[stp[1]]
            state, w_step = collapse_qubit(
                state, stp[2][0], m, u, mflag, w0, w1
            )
            weight = weight * w_step
        elif kind == "slot":
            # fused endpoint: one composed (post @ meas @ pre) block
            state = apply_matrix(
                state, slot_mats[stp[1]][0], stp[2], m,
                zero_mask=None if slot_masks is None
                else slot_masks.get(stp[1]),
            )
        else:
            pre, m4, post = slot_mats[stp[1]]
            blk = (
                pre if kind == "slot_pre"
                else m4 if kind == "slot_meas" else post
            )
            state = apply_matrix(state, blk, stp[2], m)
    if collapse_args is None:
        return state, m
    return state, m, weight


def _fuse_slot_ops(prog_ops: list) -> list:
    """Rewrite each slot's contiguous (slot_pre[, slot_meas], slot_post)
    triple into ONE ("slot", sid, axes) op — matched by the composed
    per-slot table of ``_slot_tables(fused=True)``.  axes = (qubit,
    ancilla) when the slot measures, else (qubit,)."""
    out = []
    i = 0
    while i < len(prog_ops):
        op = prog_ops[i]
        if op[0] != "slot_pre":
            out.append(op)
            i += 1
            continue
        sid = op[1]
        axes = op[2]
        j = i + 1
        if (
            j < len(prog_ops)
            and prog_ops[j][0] == "slot_meas"
            and prog_ops[j][1] == sid
        ):
            axes = prog_ops[j][2]
            j += 1
        assert (
            j < len(prog_ops)
            and prog_ops[j][0] == "slot_post"
            and prog_ops[j][1] == sid
        ), f"non-contiguous slot {sid} ops"
        out.append(("slot", sid, axes))
        i = j + 1
    return out


def finish_row(state, m, active_final, sources):
    """|psi|^2 + marginalisation onto the written clbits.  Marginalises
    over the ACTIVE qubits; a source qubit that never saw an op is
    deterministically |0> — its bit is spliced in as a zero-bit after
    the reduction.  Probabilities accumulate in f32 even for a bf16
    serving state (the convert fuses into the square)."""
    s32 = state.astype(jnp.float32)
    p = jnp.sum(s32 * s32, axis=0)
    act_sources = [q for q in sources if q in active_final]
    row = marginalize_flat(
        p, m, [active_final.index(q) for q in act_sources]
    )
    for j, q in enumerate(sources):
        if q not in active_final:
            r = row.reshape(-1, 1 << j)
            row = jnp.stack([r, jnp.zeros_like(r)], axis=1).reshape(-1)
    return row


def _steps_hbm_bytes(steps, m: int) -> tuple[int, int]:
    """Minimal HBM bytes to execute ``steps`` from width ``m`` (same
    counting rules as ops/roofline.fragment_cost).  Returns (bytes, m)."""
    b = 0
    for stp in steps:
        if stp[0] == "ins":
            b += (1 << m) * 8 + (1 << (m + 1)) * 8
            m += 1
        elif stp[0] == "pauli":
            continue
        else:
            b += 2 * (1 << m) * 8
    return b, m


@dataclass
class SplitPlan:
    """A shared-prefix split of one fragment's per-variant plan.

    Labels whose variant indices agree on the ``shared`` vgates run the
    plan's prefix identically — so the prefix is executed once per
    *ancestor* (one combination of the shared vgates' variants, ``n_anc``
    total) into a bank of ``[n_anc, 2, 2^m_split]`` states, and the
    per-label scan gathers its ancestor state and runs only the suffix.
    This is the tree-sharing the flat scan leaves on the table (PERF.md
    bounded it at 1.5-2x on the north-star configs) plus, for fragments
    not touching every vgate, full row deduplication (the flat scan
    simulates every GLOBAL label).  Reference role: the Aer batch at
    qvm/run.py:36-42 re-simulates every instantiation from scratch.
    """

    shared: list            # vgate indices (fragment slot-stream order)
    astrides: dict          # vgate -> ancestor-index stride (last fastest)
    n_anc: int
    split_idx: int          # plan step index where the suffix starts
    m_split: int            # state width at the split
    prefix_steps: list
    suffix_steps: list
    bank_bytes: int         # n_anc * 2^(m_split+1) * 4
    est_bytes: int          # modelled HBM bytes with this split
    est_flat_bytes: int     # modelled HBM bytes without sharing
    build_bytes: int = 0    # one-time bank-build bytes (prefix + write)


def split_plan(sim_one, prog, specs, global_labels: int,
               bank_budget_bytes: int = 512 << 20,
               hoisted: bool = False, state_bytes: int = 4) -> SplitPlan | None:
    """Choose the best shared-prefix split for one fragment (minimum
    modelled HBM bytes subject to the ancestor bank fitting
    ``bank_budget_bytes``).  Returns None when no split beats the flat
    plan — e.g. slot-free fragments, or a first slot at step 0.

    ``hoisted=True`` scores candidates for the SERVING shape (banks
    computed once at deploy via ``meta["bank_fn"]`` and passed to every
    ``step_fn(xs, banks)`` call): the one-time build bytes are excluded,
    so deeper splits win — est_bytes/est_flat_bytes are then per-step.

    ``state_bytes``: per-element size of the state storage (4 for f32,
    2 for the bf16 serving mode) — sizes the bank against the budget, so
    a bf16 run is allowed the deeper banks that actually fit."""
    plan = sim_one.run_plan
    slot_vg = [s.vgate_idx for s in prog.slots]
    if any(stp[0] == "pauli" for stp in plan):
        return None  # trajectory noise: states diverge per label
    # candidate splits: before each newly-seen vgate's first slot step
    # (stepping back over the segment's preceding "ins" widenings), plus
    # the all-shared split at the end of the plan
    cands: list[tuple[int, int, list]] = []  # (split_idx, m_split, shared)
    seen: list[int] = []
    m = sim_one.prefix_width
    for i, stp in enumerate(plan):
        if stp[0].startswith("slot"):
            g = slot_vg[stp[1]]
            if g not in seen:
                j, mm = i, m
                while j > 0 and plan[j - 1][0] == "ins":
                    j -= 1
                    mm -= 1
                cands.append((j, mm, list(seen)))
                seen.append(g)
        if stp[0] == "ins":
            m += 1
    cands.append((len(plan), m, list(seen)))

    finish_bytes = (1 << m) * 8 + (1 << max(0, m - 1)) * 4 + 2 * (1 << m) * 4
    best = None
    flat_est = None
    for split_idx, m_split, shared in cands:
        n_anc = 1
        for g in shared:
            n_anc *= specs[g].num_instantiations
        bank_bytes = n_anc * (1 << (m_split + 1)) * state_bytes
        pre_b, _ = _steps_hbm_bytes(plan[:split_idx], sim_one.prefix_width)
        suf_b, _ = _steps_hbm_bytes(plan[split_idx:], m_split)
        build = pre_b * n_anc + bank_bytes             # build + write bank
        step = (
            (suf_b + finish_bytes) * global_labels     # per-label suffix
            + (0 if not shared else
               global_labels * (1 << (m_split + 1)) * 4)  # ancestor gather
        )
        # hoisted serving pays the bank build ONCE at deploy, not per
        # step — score splits by per-step bytes only (budget still caps)
        est = step if hoisted else build + step
        if not shared:
            flat_est = est
        if shared and bank_bytes > bank_budget_bytes:
            continue
        if best is None or est < best[0]:
            best = (
                est, split_idx, m_split, shared, n_anc, bank_bytes, build,
            )
    if best is None or not best[3]:
        return None
    est, split_idx, m_split, shared, n_anc, bank_bytes, build = best
    if flat_est is not None and est >= flat_est:
        return None
    astrides: dict[int, int] = {}
    stride = 1
    for g in reversed(shared):
        astrides[g] = stride
        stride *= specs[g].num_instantiations
    return SplitPlan(
        shared=shared,
        astrides=astrides,
        n_anc=n_anc,
        split_idx=split_idx,
        m_split=m_split,
        prefix_steps=plan[:split_idx],
        suffix_steps=plan[split_idx:],
        bank_bytes=int(bank_bytes),
        est_bytes=int(est),
        est_flat_bytes=int(flat_est) if flat_est is not None else int(est),
        build_bytes=int(build),
    )


@dataclass
class SuffixStage:
    """One group-deduplicated segment of a SplitPlan's suffix.

    ``steps`` run once per group of ``r_out`` consecutive labels (the
    states entering the NEXT stage are broadcast from group
    representatives).  ``sids`` are the slot ids whose matrices this
    stage gathers — at representative rows ``vidx[::r_out]``."""

    steps: list
    m_in: int
    r_out: int
    sids: list


def suffix_stages(sp: SplitPlan, prog, specs, gstride: dict,
                  chunk: int) -> tuple[list, int]:
    """Partition ``sp.suffix_steps`` into in-chunk deduplicated stages.

    The global label enumeration is mixed-radix (last vgate fastest,
    :func:`label_strides`), so labels agreeing on every vgate except a
    trailing-stride set are CONSECUTIVE: within an aligned block of R
    labels, vgate column g is constant iff ``R | gstride[g]``.  Each
    suffix vgate opens a stage; the stage's segment is executed once per
    group of ``r_out`` labels (r_out = the largest trailing-product
    group size that divides ``chunk`` and every dependency's stride),
    then broadcast to the next stage's finer groups.  This captures the
    deeper tree-sharing a bigger ancestor bank would buy (PERF.md's
    "multi-level tree sharing" lever) with ZERO extra bank memory — the
    sup-25 3 GB deep-bank probe regressed on bank paging
    (northstar_tpu.json); in-chunk groups live only inside the scan
    body.  Degrades gracefully: an unaligned ``chunk`` drives every
    r_out to 1, which is exactly the previous per-label suffix path.

    Returns ``(stages, r_anc)`` where ``r_anc`` is the ancestor-gather
    group size (bank rows are fetched once per r_anc labels).
    Reference role: the Aer batch at qvm/run.py:36-42 re-simulates every
    instantiation from scratch — no sharing at any level.
    """
    slot_vg = [s.vgate_idx for s in prog.slots]
    # stage boundaries: before each newly-seen vgate's first slot,
    # stepping back over the segment's preceding "ins" widenings (the
    # same candidate rule split_plan uses, so index 0 is a boundary)
    bounds: list[tuple[int, int, int]] = []  # (step_idx, m_in, vgate)
    seen = list(sp.shared)
    m = sp.m_split
    for i, stp in enumerate(sp.suffix_steps):
        if stp[0].startswith("slot") and slot_vg[stp[1]] not in seen:
            j, mm = i, m
            while j > 0 and sp.suffix_steps[j - 1][0] == "ins":
                j -= 1
                mm -= 1
            bounds.append((j, mm, slot_vg[stp[1]]))
            seen.append(slot_vg[stp[1]])
        if stp[0] == "ins":
            m += 1
    if not bounds or bounds[0][0] != 0:
        # no suffix slot introduces a NEW vgate (all-shared split, or a
        # shared vgate's second endpoint sits in the suffix): one
        # per-label stage gathering whatever slots the suffix carries
        sids = sorted({
            stp[1] for stp in sp.suffix_steps if stp[0].startswith("slot")
        })
        return (
            [SuffixStage(list(sp.suffix_steps), sp.m_split, 1, sids)], 1,
        )

    suffix_vgs = [g for (_, _, g) in bounds]
    # natural group-size ladder: r_t = prod insts of vgates introduced
    # AFTER stage t (trailing block of the mixed radix)
    ladder = [1]
    for g in reversed(suffix_vgs[1:]):
        ladder.append(ladder[-1] * specs[g].num_instantiations)
    ladder.reverse()  # ladder[t] = natural r_out of stage t
    r_first = ladder[0] * specs[suffix_vgs[0]].num_instantiations

    def _valid(r: int, deps) -> bool:
        return (
            r >= 1 and chunk % r == 0
            and all(gstride[g] % r == 0 for g in deps)
        )

    stages: list[SuffixStage] = []
    deps = list(sp.shared)
    # effective r_out must be computed fine-to-coarse so every stage's
    # groups refine the previous stage's (r_out divides the previous)
    r_eff = [1] * len(bounds)
    for t in range(len(bounds) - 1, -1, -1):
        d = deps + suffix_vgs[: t + 1]
        nat = ladder[t]
        r_eff[t] = nat if _valid(nat, d) else (
            r_eff[t + 1] if t + 1 < len(bounds) else 1
        )
    for t, (j, mm, _g) in enumerate(bounds):
        j_next = bounds[t + 1][0] if t + 1 < len(bounds) else len(
            sp.suffix_steps
        )
        seg = list(sp.suffix_steps[j:j_next])
        sids = sorted({
            stp[1] for stp in seg if stp[0].startswith("slot")
        })
        stages.append(SuffixStage(seg, mm, r_eff[t], sids))
    r_anc = r_first if _valid(r_first, sp.shared) else r_eff[0]
    return stages, r_anc


def ideal_stage_align(sp: SplitPlan, prog, specs, gstride: dict) -> int:
    """The chunk multiple at which :func:`suffix_stages` engages fully
    for this fragment (the stride-valid coarsest group size, ignoring
    chunk divisibility).  Surfaced as ``meta["stage_align"]`` by
    make_streamed_knit; informational — chunks are not auto-aligned
    (staging measured bandwidth-neutral on the v5e, PERF.md), callers
    pass an aligned chunk themselves to engage it."""
    # chunk=0 sentinel: 0 % r == 0 for every r, so only strides bind
    stages, r_anc = suffix_stages(sp, prog, specs, gstride, 0)
    return max([r_anc] + [st.r_out for st in stages])


def make_split_fns(sim_one, sp: SplitPlan):
    """(prefix_one, suffix_one) closures for a :class:`SplitPlan`:
    ``prefix_one(slot_mats) -> [2, 2^m_split]`` ancestor state;
    ``suffix_one(state, slot_mats) -> row``.  Both take slot matrices
    keyed by slot id (dicts are fine) and are vmap/jit-traceable."""
    prefix_state = sim_one.prefix_state
    m0 = sim_one.prefix_width
    active_final = sim_one.active_final
    sources = sim_one.sources
    slot_masks = getattr(sim_one, "slot_masks", None)

    dtype = getattr(sim_one, "dtype", jnp.float32)

    def prefix_one(slot_mats):
        state, m = exec_plan_steps(
            jnp.asarray(prefix_state, dtype=dtype), m0, sp.prefix_steps,
            slot_mats, slot_masks=slot_masks,
        )
        assert m == sp.m_split
        return state

    def suffix_one(state, slot_mats):
        state, m = exec_plan_steps(
            state, sp.m_split, sp.suffix_steps, slot_mats,
            slot_masks=slot_masks,
        )
        return finish_row(state, m, active_final, sources)

    return prefix_one, suffix_one


def make_sim_fn(virt: VirtualCircuit, frag_name: str, noise=None,
                build_matrices: bool = True, fuse_qubits: int = 3,
                fused_slots: bool = False, dtype=None,
                collapse: bool = False):
    """Build the per-variant simulation closure for a fragment.

    ``fused_slots``: exact path only — collapse each slot's
    (pre, meas, post) steps into ONE composed block step ("slot" kind,
    tables from ``_slot_tables(fused=True)``): 3 HBM passes per endpoint
    become 1.  Callers that gather slot tables themselves must pass the
    same flag to :func:`_slot_tables`.

    Returns (sim_one, slot_mats, positions, flat_count) where ``sim_one``
    maps one variant's slot matrices to its probability row (traceable, so
    it can be vmapped/sharded/jitted by callers), ``slot_mats`` is the list
    of per-slot stacked matrices over all ``flat_count`` variants — or
    ``None`` with ``build_matrices=False`` (callers that gather slot
    tables on device per :func:`variant_index_table` skip the
    O(flat_count x slots) host gather).

    With ``noise`` (a NoiseModel), ``sim_one(slot_mats, pauli_mats)``
    additionally applies one sampled-Pauli matrix per physical gate site
    (trajectory depolarising; see ops/noise.py).  ``sim_one.noise_sites``
    lists (site_index -> depolarising probability).

    ``dtype``: statevector storage dtype (default f32).  ``bfloat16`` is
    the quantized SERVING mode: every state pass moves half the HBM
    bytes; gate constants follow the state dtype (apply_matrix) and
    probabilities still accumulate in f32 (finish_row).  Exact path
    only — per-amplitude rounding is ~2^-8 per pass, suited to
    shot-serving where shot noise dominates (see PERF.md).

    ``collapse``: sampled-measurement mode (exact path only) — vgate
    measurements COLLAPSE in-sim (:func:`collapse_qubit`) instead of
    deferring onto ancilla qubits, so the state width stays at the data
    qubits no matter how many cuts measure (the ancilla path costs a
    qubit per measuring cut: qft-16's 15-cut fragment would need 2^30
    states).  ``sim_one(slot_mats, collapse_args)`` then takes
    ``collapse_args``: slot id -> (u, mflag, w0, w1) per-variant scalars
    (uniform draw, measure flag, fold weights), returns the probability
    row PRE-MULTIPLIED by the sampled fold weights, and the vgate clbits
    are absent from ``positions`` (rows are already contracted over
    them, stochastically).  Unbiased; used by the sampled estimator
    (ops/qpd_sampling) for beyond-ancilla-budget fragments.
    """
    prog = virt.programs[frag_name]
    specs = [vg.spec for vg in virt.vgates]
    # the noise path needs the unfused per-step stream (slot_post noise
    # sites attach to individual endpoint ops)
    fused_slots = fused_slots and noise is None
    if collapse:
        if noise is not None:
            raise ValueError("collapse mode is exact-path only")
        fused_slots = False  # slot_meas must stay a distinct step

    strides, n_inst, flat_count = label_strides(specs, prog.touching)

    n = prog.num_sim_qubits
    clbit_sources = prog.clbit_sources
    phys = None
    readout_device = None

    # exact path: fuse contiguous fixed-gate runs between slots.  The
    # noise path keeps the unfused stream (per-physical-gate noise sites)
    # and, when the NoiseModel carries a coupling map, routes it onto the
    # device topology first — matching the reference where backend.run
    # implies transpilation (SWAP-inflated CNOT counts, BASELINE.md).
    if noise is None:
        from .fusion import fused_stream

        # 3-qubit block fusion: every merged block replaces >= 2 HBM
        # passes with one on the bandwidth-limited engines (the sharded
        # and Pallas paths, whose apply only handles 2q, stay at 2)
        source_ops = _fuse_slot_ops(prog.ops) if fused_slots else prog.ops
        if collapse:
            # measure in-place instead of CX-ing onto the deferral
            # ancilla; the ancilla then never appears in any op, so the
            # lazy-introduction pass never allocates its state bit
            source_ops = [
                ("collapse", op[1], (op[2][0],)) if op[0] == "slot_meas"
                else op
                for op in source_ops
            ]
            clbit_sources = {
                c: q for c, q in prog.clbit_sources.items()
                if c < virt.num_clbits
            }
        skeleton, mats = fused_stream(source_ops, max_qubits=fuse_qubits)
        prog_ops = []
        bi = 0
        for op in skeleton:
            if op[0] == "u":
                prog_ops.append(("u", mats[bi], op[1]))
                bi += 1
            else:
                prog_ops.append(op)
    elif getattr(noise, "coupling", None) is not None:
        from ..circuit.routing import route_stream

        routed = route_stream(
            prog.ops, prog.num_data_qubits, prog.clbit_sources,
            noise.coupling,
        )
        prog_ops = routed.ops
        phys = routed.phys
        clbit_sources = routed.clbit_sources
        # device node holding each written clbit's value, for calibrated
        # readout lookup (same rule as the uncut path's _ro_qubit)
        readout_device = {
            c: (routed.slot_device[s] if s < len(routed.slot_device)
                else None)
            for c, s in clbit_sources.items()
        }
    else:
        prog_ops = prog.ops

    positions = sorted(clbit_sources)
    sources = [clbit_sources[c] for c in positions]

    # physical-gate noise sites: (after which op, on which qubit,
    # sampling probs4, Kraus bank4, signed branch weights4 | None) —
    # depolarising per gate, thermal relaxation per touched qubit when
    # the model carries T1/T2, and the PEC quasi-inverse when nm.pec
    # (ops/noise.gate_noise_sites)
    noise_sites: list[tuple[int, int, object, object, object]] = []
    if noise is not None:
        from .noise import (
            _depol_site,
            _relax_site,
            gate_noise_sites,
            pec_inverse_site,
        )

        for op_i, op in enumerate(prog_ops):
            kind = op[0]
            ph = phys[op_i] if phys is not None else op[2]
            if kind == "u":
                if any(p is None for p in ph):
                    continue  # deferral-ancilla op: readout covers it
                # one depolarising site per gate (same convention as the
                # uncut path in ops/noise.simulate_noisy_circuit, so cut
                # and uncut circuits carry comparable noise burdens)
                for site in gate_noise_sites(noise, op[2], ph):
                    noise_sites.append((op_i, *site))
            elif kind == "slot_post":
                # one endpoint of a cut 2q gate: the pair splits across
                # fragments, so each endpoint carries half the 2q rate
                dev = ph[0] if ph and ph[0] is not None else op[2][0]
                p_half = 0.5 * noise.rate_2q(dev, dev)
                noise_sites.append(
                    (op_i, op[2][0], *_depol_site(p_half), None)
                )
                # the PEC quasi-inverse must sit IMMEDIATELY after its
                # depolarising site, before the (non-unital,
                # non-commuting) relaxation sites — same ordering as
                # ops/noise.gate_noise_sites
                if noise.pec and p_half > 0.0:
                    noise_sites.append(
                        (op_i, op[2][0], *pec_inverse_site(p_half))
                    )
                if noise.has_relaxation:
                    gamma, lam = noise.relax_gamma_lambda(
                        dev, noise.gate_time_2q
                    )
                    if gamma > 0.0 or lam > 0.0:
                        noise_sites.append(
                            (op_i, op[2][0], *_relax_site(gamma, lam), None)
                        )
    sites_after: dict[int, list[int]] = {}
    for s_i, (op_i, *_rest) in enumerate(noise_sites):
        sites_after.setdefault(op_i, []).append(s_i)

    # Lazy qubit introduction (both paths): a sim qubit's state bit exists
    # only from the start of the slot-delimited SEGMENT of its first op
    # ("ins" grows the state by a |0> bit at the qubit's sorted position).
    # Deferral ancillas — allocated up-front by FragmentProgram but
    # untouched until their slot's measure op — then cost nothing until
    # mid-circuit: a sup-25 fragment (13 data + 5 ancilla qubits) runs
    # most of its gates at 2^13..2^15 instead of all of them at 2^18.
    # Introductions are COALESCED at segment boundaries so the number of
    # distinct state widths is bounded by #slots+1 rather than #qubits —
    # per-op widths ballooned the tunneled backend's compile time (a
    # ghz-24 chain introduces a qubit per gate).  Plan steps carry axes
    # TRANSLATED to positions within the active set at that point, so the
    # executor stays shape-static and jit/vmap-friendly.  Noise sites
    # become explicit ("pauli", site, pos) steps at the width of their op.
    import bisect

    op_seg = []
    seg = 0
    for op in prog_ops:
        if op[0] not in ("u", "u_aux"):
            seg += 1
        op_seg.append(seg)
    first_seg: dict[int, int] = {}
    for op, sgi in zip(prog_ops, op_seg):
        for q in op[2]:
            first_seg.setdefault(q, sgi)

    active: list[int] = []
    plan: list[tuple] = []
    cur_seg = -1
    for op_i, op in enumerate(prog_ops):
        if op_seg[op_i] > cur_seg:
            for s in range(cur_seg + 1, op_seg[op_i] + 1):
                for q in sorted(
                    q for q, fs in first_seg.items() if fs == s
                ):
                    pos = bisect.bisect_left(active, q)
                    plan.append(("ins", pos, None))
                    active.insert(pos, q)
            cur_seg = op_seg[op_i]
        kind, axes = op[0], op[2]
        tr = tuple(active.index(q) for q in axes)
        if kind in ("u", "u_aux"):
            plan.append(("u", to_real_block(op[1]), tr))
        else:
            plan.append((kind, op[1], tr))  # payload = slot id
        for s_i in sites_after.get(op_i, ()):
            q = noise_sites[s_i][1]
            plan.append(("pauli", s_i, (active.index(q),)))
    active_final = list(active)

    # Prefix sharing: every plan step before the first variant-dependent
    # step (slot matrices; sampled Pauli sites) is identical across the
    # whole fan-out — run it ONCE on the host; each variant starts from
    # the resulting constant state.
    from .statevector import apply_matrix_host

    first_var = next(
        (i for i, stp in enumerate(plan) if stp[0] not in ("ins", "u")),
        len(plan),
    )
    st = np.zeros((2, 1), np.float32)
    st[0, 0] = 1.0
    m0 = 0
    for stp in plan[:first_var]:
        if stp[0] == "ins":
            pos = stp[1]
            r = st.reshape(2, 1 << pos, 1 << (m0 - pos))
            st = np.stack(
                [r, np.zeros_like(r)], axis=2
            ).reshape(2, 1 << (m0 + 1))
            m0 += 1
        else:
            st = apply_matrix_host(st, stp[1], stp[2], m0)
    prefix_state, run_plan = st, plan[first_var:]

    # union nonzero pattern of each fused slot table: a host-known static
    # superset of every gathered block's support (the per-variant values
    # are traced, the pattern is not) — lets apply_matrix use the masked
    # slice-combine path instead of the einsum lowering
    slot_masks = None
    if fused_slots and prog.slots:
        slot_masks = {
            sid: np.any(np.asarray(tabs[0]) != 0, axis=0)
            for sid, tabs in enumerate(_slot_tables(prog, specs, fused=True))
        }

    _dtype = jnp.float32 if dtype is None else dtype
    if _dtype != jnp.float32:
        assert noise is None, "bf16 serving mode is exact-path only"

    if collapse:
        def _sim_one(slot_mats, collapse_args):
            state, m, w = exec_plan_steps(
                jnp.asarray(prefix_state, dtype=_dtype), m0, run_plan,
                slot_mats, slot_masks=slot_masks,
                collapse_args=collapse_args,
            )
            return finish_row(state, m, active_final, sources) * w

        _sim_one.collapse_slots = [
            stp[1] for stp in run_plan if stp[0] == "collapse"
        ]
    else:
        def _sim_one(slot_mats, pauli_mats=None):
            state, m = exec_plan_steps(
                jnp.asarray(prefix_state, dtype=_dtype), m0, run_plan,
                slot_mats, pauli_mats, slot_masks=slot_masks,
            )
            return finish_row(state, m, active_final, sources)

    _sim_one.dtype = _dtype
    _sim_one.noise_sites = noise_sites
    _sim_one.readout_device = readout_device
    _sim_one.slot_masks = slot_masks
    # the real execution plan, for the analytic performance model
    # (ops/roofline.py): per-variant steps after the shared host prefix,
    # the prefix width, and the final active-qubit set
    _sim_one.run_plan = run_plan
    _sim_one.prefix_width = m0
    _sim_one.prefix_state = prefix_state
    _sim_one.active_final = active_final
    _sim_one.sources = sources
    # callers that gather slot matrices ON DEVICE (streamed / sharded
    # paths) skip the O(flat_count x slots x ~384 B) host gather
    all_mats = (
        _slot_matrices(
            prog, specs, flat_count, strides, n_inst, fused=fused_slots
        )
        if build_matrices else None
    )
    return _sim_one, all_mats, positions, flat_count


def run_fragment(
    virt: VirtualCircuit,
    frag_name: str,
    chunk_size: int = 1024,
) -> FragmentResult:
    """Exact probability rows for every variant of one fragment."""
    prog = virt.programs[frag_name]
    _sim_one, all_mats, positions, flat_count = make_sim_fn(
        virt, frag_name, fused_slots=True
    )
    width = max(1, 2 ** len(positions))

    if not prog.slots:
        row = np.asarray(jax.jit(_sim_one)([]))
        values = np.broadcast_to(row, (flat_count, width)).copy()
        return FragmentResult(frag_name, values, positions, list(prog.touching))

    chunk = min(chunk_size, flat_count, chunk_cap(prog.num_sim_qubits))
    values = scan_variant_rows(_sim_one, (all_mats,), flat_count, chunk)
    return FragmentResult(frag_name, values, positions, list(prog.touching))


def run_all_fragments(
    virt: VirtualCircuit, chunk_size: int = 1024
) -> list[FragmentResult]:
    return [
        run_fragment(virt, reg.name, chunk_size) for reg in virt.fragments
    ]
