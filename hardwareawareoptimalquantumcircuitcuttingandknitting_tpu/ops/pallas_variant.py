"""Whole-variant-in-VMEM Pallas kernel (the r4 bandwidth-gap attempt).

The XLA scan applies each gate as a separate HLO op, so every gate
streams the full ``[chunk, 2, 2^n]`` state through HBM — measured 216-267
GB/s sustained and ~3x minimal bytes (PERF.md).  For fragments whose
state fits VMEM (n <= 20 under the raised scoped budget), the whole per-variant
simulation can instead run RESIDENT in VMEM: grid over variants, one
kernel invocation simulates all gates and writes only the final
probability row to HBM.  HBM traffic collapses from
``O(gates x 2^n)`` to ``O(2^n)`` per variant; the cost moves to VPU
passes.

Layout: the flat real-rep state ``[2, 2^n]`` (qubit 0 = MSB) is held as
``[2, R, 128]`` with R = 2^(n-7): flat bit j < 7 is a LANE bit, j >= 7 a
ROW (sublane-major) bit.  Gate application is XOR-pairing:

  * row-bit partner  = flip of the size-2 axis in a static reshape;
  * lane-bit partner = two ``jnp.roll``s along lanes + bit-mask select;
  * the 2/4 gate coefficients are selected per position by the OWN bit
    values (broadcasted iota masks), so fixed gates are constants and
    QPD slot gates read per-variant complex entries gathered on host.

This is attempt #2 at the VERDICT r3 "fused suffix" item (attempt #1,
ops/pallas_sv.py, lost at 0.58x with per-gate HBM passes — the design
error this kernel fixes).  Opt-in, like every Mosaic path on the
tunneled backend (minutes-scale remote compiles, amortised into the
one-time deploy).  Correctness is locked against the XLA engine in
tests/test_pallas_variant.py (interpret mode on CPU).
"""
from __future__ import annotations


import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..virt.virtual_circuit import VirtualCircuit
from .variant_engine import (
    FragmentResult,
    _slot_tables,
    label_strides,
    variant_index_table,
)

LANE_BITS = 7  # 128 lanes


def _to_complex(block: np.ndarray) -> np.ndarray:
    """Real (2, m, 2, m) block -> complex (m, m)."""
    return block[0, :, 0, :] + 1j * block[1, :, 0, :]


def _plan_ops(virt: VirtualCircuit, frag_name: str):
    """(prefix_ops, suffix_steps, slot_ms, n) — the same fused-slot op
    stream the XLA engines execute, split at the first slot.  Suffix
    steps: ("u", complex mat, axes) | ("slot", slot_pos, m, axes)."""
    from .fusion import fused_stream
    from .variant_engine import _fuse_slot_ops

    prog = virt.programs[frag_name]
    skeleton, mats = fused_stream(
        _fuse_slot_ops(prog.ops), max_qubits=2
    )
    ops = []
    bi = 0
    for op in skeleton:
        if op[0] == "u":
            ops.append(("u", np.asarray(mats[bi], complex), op[1]))
            bi += 1
        else:  # ("slot", sid, axes)
            ops.append(op)
    first = next(
        (i for i, op in enumerate(ops) if op[0] != "u"), len(ops)
    )
    return ops[:first], ops[first:], prog


def _bitval(j: int, R: int):
    """[R, 128] int32 value of flat bit j (j<7: lane bit, else row)."""
    if j < LANE_BITS:
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        return (lane >> j) & 1
    row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
    return (row >> (j - LANE_BITS)) & 1


def _partner(x, j: int, R: int):
    """XOR-partner of [R, 128] x along flat bit j."""
    if j < LANE_BITS:
        fwd = jnp.roll(x, 1 << j, axis=1)    # lane -> lane + 2^j
        bwd = jnp.roll(x, -(1 << j), axis=1)  # lane -> lane - 2^j
        b = _bitval(j, R)
        return jnp.where(b == 1, fwd, bwd)
    rb = j - LANE_BITS
    hi = R >> (rb + 1)
    x4 = x.reshape(hi, 2, (1 << rb) * 128)
    # swap the size-2 axis via slice+concat (lax.rev has no Mosaic
    # lowering)
    sw = jnp.concatenate([x4[:, 1:2], x4[:, 0:1]], axis=1)
    return sw.reshape(R, 128)


def _sel2(b, e0, e1):
    return jnp.where(b == 1, e1, e0)


def _sel4(ba, bb, e):
    """e: callable(m) -> scalar; select e[2*ba+bb] per position."""
    return jnp.where(
        ba == 1,
        jnp.where(bb == 1, e(3), e(2)),
        jnp.where(bb == 1, e(1), e(0)),
    )


def _z(v) -> bool:
    
    """Trace-time zero test: True only for host-known zero coefficients
    (fixed-gate entries are python floats; slot entries are tracers)."""
    return isinstance(v, (int, float)) and v == 0.0


def _cmac(accr, acci, cr, ci, sr, si):
    """acc += (cr + i ci) * (sr + i si), skipping host-known zeros."""
    if not _z(cr):
        accr = sr * cr if accr is None else accr + sr * cr
        acci = si * cr if acci is None else acci + si * cr
    if not _z(ci):
        accr = (-ci) * si if accr is None else accr - ci * si
        acci = ci * sr if acci is None else acci + ci * sr
    return accr, acci


def _apply_1q(re, im, j, R, ur, ui):
    """ur/ui: callable(r, c) -> scalar (traced or python float).
    Diagonal fixed gates skip the partner fetch entirely."""
    b = _bitval(j, R)
    kr = _sel2(b, ur(0, 0), ur(1, 1))
    ki = _sel2(b, ui(0, 0), ui(1, 1))
    nre = kr * re - ki * im
    nim = kr * im + ki * re
    off = (ur(0, 1), ur(1, 0), ui(0, 1), ui(1, 0))
    if all(_z(v) for v in off):
        return nre, nim
    sr = _sel2(b, ur(0, 1), ur(1, 0))
    si = _sel2(b, ui(0, 1), ui(1, 0))
    pre = _partner(re, j, R)
    pim = _partner(im, j, R)
    return nre + sr * pre - si * pim, nim + sr * pim + si * pre


def _apply_1q_row(re, im, j, R, ur, ui):
    """1q gate on a ROW bit: direct slice arithmetic on the two
    half-blocks — no partner materialisation, no masks, host-known zero
    coefficients skipped at trace time."""
    rb = j - LANE_BITS
    sh = (R >> (rb + 1), 2, (1 << rb) * 128)
    xr = re.reshape(sh)
    xi = im.reshape(sh)
    outs = []
    for a in (0, 1):
        accr = acci = None
        for i in (0, 1):
            accr, acci = _cmac(
                accr, acci, ur(a, i), ui(a, i), xr[:, i], xi[:, i]
            )
        if accr is None:
            accr = jnp.zeros_like(xr[:, 0])
            acci = jnp.zeros_like(xi[:, 0])
        outs.append((accr, acci))
    nre = jnp.stack([outs[0][0], outs[1][0]], axis=1).reshape(R, 128)
    nim = jnp.stack([outs[0][1], outs[1][1]], axis=1).reshape(R, 128)
    return nre, nim


def _apply_2q_rowrow(re, im, ja, jb, R, ur, ui):
    """2q gate with BOTH qubits on row bits: direct slice arithmetic on
    the four quarter-blocks (16 complex MACs, zeros skipped)."""
    rb_a, rb_b = ja - LANE_BITS, jb - LANE_BITS
    hi_b, lo_b = max(rb_a, rb_b), min(rb_a, rb_b)
    sh = (R >> (hi_b + 1), 2, 1 << (hi_b - lo_b - 1), 2,
          (1 << lo_b) * 128)
    xr = re.reshape(sh)
    xi = im.reshape(sh)

    def mval(i, j):  # gate index: ja is the gate MSB
        return 2 * i + j if rb_a == hi_b else 2 * j + i

    rows = []
    for a in (0, 1):
        cols = []
        for b in (0, 1):
            accr = acci = None
            for i in (0, 1):
                for j_ in (0, 1):
                    accr, acci = _cmac(
                        accr, acci,
                        ur(mval(a, b), mval(i, j_)),
                        ui(mval(a, b), mval(i, j_)),
                        xr[:, i, :, j_], xi[:, i, :, j_],
                    )
            if accr is None:
                accr = jnp.zeros_like(xr[:, 0, :, 0])
                acci = jnp.zeros_like(xi[:, 0, :, 0])
            cols.append((accr, acci))
        rows.append(cols)
    nre = jnp.stack([
        jnp.stack([rows[0][0][0], rows[0][1][0]], axis=2),
        jnp.stack([rows[1][0][0], rows[1][1][0]], axis=2),
    ], axis=1).reshape(R, 128)
    nim = jnp.stack([
        jnp.stack([rows[0][0][1], rows[0][1][1]], axis=2),
        jnp.stack([rows[1][0][1], rows[1][1][1]], axis=2),
    ], axis=1).reshape(R, 128)
    return nre, nim


def _apply_2q(re, im, ja, jb, R, ur, ui):
    """General 2q gate; ja = gate MSB's flat bit.  ur/ui: (r, c) ->
    scalar.  out = sum over the 4 XOR-sources, coefficient selected by
    the position's own (ba, bb); XOR-source groups whose four
    coefficients are all host-known zeros are skipped (diagonal /
    block-sparse fixed gates need no partner fetches)."""
    ba = _bitval(ja, R)
    bb = _bitval(jb, R)

    def group_zero(f):
        return all(
            _z(ur(m, m ^ f)) and _z(ui(m, m ^ f)) for m in range(4)
        )

    def acc(nre, nim, flip, sre, sim):
        cr = _sel4(ba, bb, lambda m, f=flip: ur(m, m ^ f))
        ci = _sel4(ba, bb, lambda m, f=flip: ui(m, m ^ f))
        return nre + cr * sre - ci * sim, nim + cr * sim + ci * sre

    # sequence the XOR-sources so at most ONE partner pair (plus the
    # Pa pair feeding Pab) is live at a time — the all-at-once version
    # blew Mosaic's 16 MB scoped-VMEM budget at n=18
    nre, nim = acc(jnp.zeros_like(re), jnp.zeros_like(im), 0, re, im)
    if not group_zero(1):
        nre, nim = acc(
            nre, nim, 1, _partner(re, jb, R), _partner(im, jb, R)
        )
    need_a = not group_zero(2)
    need_ab = not group_zero(3)
    if need_a or need_ab:
        pa_re, pa_im = _partner(re, ja, R), _partner(im, ja, R)
        if need_a:
            nre, nim = acc(nre, nim, 2, pa_re, pa_im)
        if need_ab:
            nre, nim = acc(
                nre, nim, 3,
                _partner(pa_re, jb, R), _partner(pa_im, jb, R),
            )
    return nre, nim


def _build_call(virt: VirtualCircuit, frag_name: str, grid_count: int,
                interpret: bool = False, fold=None, staged: bool = False):
    """Shared kernel construction: ``(call, entry_tables, entry_gids,
    prefix_state, n, R)`` with ``call(*entries, prefix) ->
    [grid_count, R, 128]`` full-width probability rows.  ``entries`` are
    per-variant complex slot entries ``[grid_count, 2, m, m]``
    (``entry_tables[k][variant_index]``, variant index = entry k's
    GLOBAL vgate ``entry_gids[k]``'s label component).  Returns None
    when the fragment does not fit (state > VMEM budget or < 1 lane
    row).

    ``fold`` (r5, VERDICT r4 #3 — the fold/knit epilogue fusion): fold
    the vgate measure bits, drops and z-contractions IN-KERNEL so the
    HBM write per variant shrinks from the full 2^n row to the
    data-width knit contribution.  Dict:

      * ``w``: ``[(clbit | None, ti)]`` per touching vgate — weight
        column ti of the per-label ``[1, n_w, 2]`` weight input folds
        that clbit's bit (elementwise ``w0/w1`` select then sum); None
        = whole-row scalar ``w0`` (owner-non-measuring);
      * ``z``: clbits contracted with signs (+1, -1);
      * ``keep``: kept clbits ASCENDING — the output's little-endian
        bit order (streamed fold_plans' final layout).

    The state layout is PERMUTED so kept clbits sit on flat bits
    0..d-1; every other qubit (folded bits, dropped clbits, unmeasured
    qubits) lands on the high row bits and the epilogue reduces them
    with ONE leading-axis sum after the elementwise weighting — fold
    operations on distinct bits commute, so order is free.  Output rows
    are ``[grid, R', 128]`` (d > 7) or ``[grid, 128]`` (2^d lanes
    meaningful) — ``call`` returns them; the wrapper reshapes.
    ``call(*entries, wstack, prefix)`` with ``wstack [grid, n_w, 2]``.
    Returns None additionally when fold is requested with d > n.

    ``staged`` (r5, the "fewer passes per gate" arithmetic lever,
    PERF.md): TPU Pallas grids execute SEQUENTIALLY with scratch
    persisting across grid steps, so per-slot checkpoint states can
    live in VMEM scratch and each variant re-runs only the gate-chain
    segments from its first changed slot onward.  The suffix is grouped
    into one segment per slot (the slot plus the fixed gates up to the
    next slot); segment ``i`` executes under ``pl.when(stage <= i)``
    reading checkpoint ``i-1`` (or the prefix) and writing checkpoint
    ``i``.  The caller passes a per-variant int32 ``stage`` array —
    the first CHAIN-ORDER slot whose entry differs from the previous
    grid step's variant (0 for the first variant of every call; the
    number of slots when nothing changed).  Under the global
    mixed-radix label order consecutive labels differ only in the
    minor-most vgates, which sit chain-LATE, so most variants replay
    only the final segment — the same sharing `suffix_stages` exploits
    for the XLA banked path, now VMEM-resident.  Call signature gains
    the stage array before the prefix:
    ``call(*entries, [wstack,] stage, prefix)``.  The returned tuple's
    last element says whether the staged layout was actually built
    (False when the fragment has no slots)."""
    from .statevector import apply_matrix_host

    prefix_ops, suffix, prog = _plan_ops(virt, frag_name)
    specs = [vg.spec for vg in virt.vgates]
    n = prog.num_sim_qubits
    # width gate: 2^n state (2 x 4 B/amp) + working set must fit VMEM;
    # n=20 (syc-32 fragments) compiles within the raised scoped budget
    # after the row-direct fast paths cut the live temporaries.  n=21 was
    # probed on the v5e and is a MEASURED hard boundary: the compiler
    # reports 166.31M of VMEM needed (16M prefix window + 2x8M
    # double-buffered output + 16M scratch + gate-chain temporaries)
    # vs the chip's 128M physical — syc-36-class fragments stay on the
    # XLA scan single-chip or the sharded engine (PERF.md r4 boundary)
    if n < LANE_BITS + 1 or n > 20:
        return None
    R = 1 << (n - LANE_BITS)

    # ---- flat-bit layout (optionally permuted for the fold epilogue) --
    if fold is None:
        flat_of_q = {q: n - 1 - q for q in range(n)}
        d_keep = None
    else:
        kept = list(fold["keep"])
        d_keep = len(kept)
        flat_of_q = {}
        for j, c in enumerate(kept):
            flat_of_q[prog.clbit_sources[c]] = j
        nxt = d_keep
        for q in range(n):
            if q not in flat_of_q:
                flat_of_q[q] = nxt
                nxt += 1
        assert nxt == n, (nxt, n)
        # weighted bits: (flat_bit | None, ti); z bits: flat bits
        fold_wbits = [
            (None if c is None else flat_of_q[prog.clbit_sources[c]], ti)
            for c, ti in fold["w"]
        ]
        fold_zbits = [
            flat_of_q[prog.clbit_sources[c]] for c in fold.get("z", ())
        ]
        assert all(fb is None or fb >= d_keep for fb, _ in fold_wbits)
        assert all(fb >= d_keep for fb in fold_zbits)
        n_w = max(1, len(fold_wbits))

    # host-shared prefix at full width (axes mapped through the layout:
    # apply_matrix_host's qubit q' sits on flat bit n-1-q')
    st = np.zeros((2, 1 << n), np.float32)
    st[0, 0] = 1.0
    for op in prefix_ops:
        st = apply_matrix_host(
            st, op[1], tuple(n - 1 - flat_of_q[q] for q in op[2]), n
        )
    prefix_state = st.reshape(2, R, 128)

    fused_tabs = _slot_tables(prog, specs, fused=True)
    slot_steps = [op for op in suffix if op[0] == "slot"]
    entry_tables = []
    entry_gids = []
    slot_m = {}
    for op in slot_steps:
        sid = op[1]
        tab = fused_tabs[sid][0]  # [nI, 2, m, 2, m] real blocks
        m = tab.shape[2]
        slot_m[sid] = m
        cx = np.stack([_to_complex(t) for t in tab])  # [nI, m, m]
        ent = np.stack([cx.real, cx.imag], axis=1).astype(np.float32)
        entry_tables.append(ent)
        entry_gids.append(prog.slots[sid].vgate_idx)
    padded = grid_count

    def _apply_op(re, im, op, slot_ref):
        if op[0] == "u":
            mat, axes = op[1], op[2]
            js = [flat_of_q[q] for q in axes]
            ur = lambda r, c, M=mat: float(M[r, c].real)
            ui = lambda r, c, M=mat: float(M[r, c].imag)
        else:
            _sid, axes = op[1], op[2]
            js = [flat_of_q[q] for q in axes]
            ur = lambda r, c, _r=slot_ref: _r[0, 0, r, c]
            ui = lambda r, c, _r=slot_ref: _r[0, 1, r, c]
        if len(axes) == 1:
            if js[0] >= LANE_BITS:
                return _apply_1q_row(re, im, js[0], R, ur, ui)
            return _apply_1q(re, im, js[0], R, ur, ui)
        if min(js) >= LANE_BITS:
            return _apply_2q_rowrow(re, im, js[0], js[1], R, ur, ui)
        return _apply_2q(re, im, js[0], js[1], R, ur, ui)

    def _epilogue(re, im, w_ref, out_ref):
        sq = re * re + im * im
        if fold is None:
            out_ref[0] = sq
            return
        # ---- fold epilogue: elementwise weighting, then ONE sum ------
        # (fold ops on distinct bits commute; weights are per-label
        # scalars from the [1, n_w, 2] block)
        for fb, ti in fold_wbits:
            w0 = w_ref[0, ti, 0]
            w1 = w_ref[0, ti, 1]
            if fb is None:
                sq = sq * w0
            else:
                b = _bitval(fb, R)
                sq = sq * jnp.where(b == 1, w1, w0)
        for fb in fold_zbits:
            sq = sq * (
                1.0 - 2.0 * _bitval(fb, R).astype(jnp.float32)
            )
        if d_keep > LANE_BITS:
            rk = 1 << (d_keep - LANE_BITS)
            out_ref[0] = jnp.sum(
                sq.reshape(R // rk, rk, 128), axis=0
            )
        else:
            # <= 128 outcomes: masked lane reduction (kept bits are the
            # low lane bits by construction)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            kmap = jax.lax.broadcasted_iota(
                jnp.int32, (R, 128), 1
            ) & ((1 << d_keep) - 1)
            out = jnp.zeros((1, 128), jnp.float32)
            for k in range(1 << d_keep):
                s = jnp.sum(jnp.sum(
                    sq * (kmap == k).astype(jnp.float32),
                    axis=1, keepdims=True,
                ), axis=0, keepdims=True)
                out = out + jnp.where(lane == k, s, jnp.float32(0.0))
            out_ref[...] = out

    def kernel(*refs):
        slot_refs = refs[: len(slot_steps)]
        if fold is None:
            w_ref = None
            prefix_ref = refs[len(slot_steps)]
            out_ref = refs[len(slot_steps) + 1]
            st_ref = refs[len(slot_steps) + 2]
        else:
            w_ref = refs[len(slot_steps)]
            prefix_ref = refs[len(slot_steps) + 1]
            out_ref = refs[len(slot_steps) + 2]
            st_ref = refs[len(slot_steps) + 3]
        st_ref[0] = prefix_ref[0]
        st_ref[1] = prefix_ref[1]
        si = 0
        for op in suffix:
            re = st_ref[0]
            im = st_ref[1]
            sref = None
            if op[0] != "u":
                sref = slot_refs[si]
                si += 1
            re, im = _apply_op(re, im, op, sref)
            # write back: the scratch is the only value live across
            # steps, bounding Mosaic's scoped-VMEM working set
            st_ref[0] = re
            st_ref[1] = im
        _epilogue(st_ref[0], st_ref[1], w_ref, out_ref)

    # ---- staged layout: one segment per slot, VMEM checkpoints ------
    # budget gate: k_seg checkpoint states (2^n x 8 B each) must leave
    # room for the measured ~34 MB unrolled-chain working set + the
    # 2^n x 8 B prefix window inside the 120 MB scoped limit
    is_staged = bool(
        staged and slot_steps
        and len(slot_steps) * (2 * R * 128 * 4) <= 64 * 1024 * 1024
    )
    if is_staged:
        assert suffix[0][0] == "slot", "suffix must start at a slot"
        segments: list[list] = []
        for op in suffix:
            if op[0] == "slot":
                segments.append([op])
            else:
                segments[-1].append(op)
        k_seg = len(segments)
        assert k_seg == len(slot_steps)

        def kernel_staged(*refs):
            slot_refs = refs[:k_seg]
            idx = k_seg
            w_ref = None
            if fold is not None:
                w_ref = refs[idx]
                idx += 1
            stage_ref = refs[idx]
            prefix_ref = refs[idx + 1]
            out_ref = refs[idx + 2]
            ck_ref = refs[idx + 3]
            s = stage_ref[pl.program_id(0)]
            for i, seg in enumerate(segments):

                def _seg(i=i, seg=seg):
                    first = True
                    for op in seg:
                        if first:
                            re = (prefix_ref[0] if i == 0
                                  else ck_ref[i - 1, 0])
                            im = (prefix_ref[1] if i == 0
                                  else ck_ref[i - 1, 1])
                            first = False
                        else:
                            re = ck_ref[i, 0]
                            im = ck_ref[i, 1]
                        re, im = _apply_op(
                            re, im, op,
                            slot_refs[i] if op[0] != "u" else None,
                        )
                        # per-op write-back bounds the live working set
                        # (same discipline as the unstaged kernel)
                        ck_ref[i, 0] = re
                        ck_ref[i, 1] = im

                pl.when(s <= i)(_seg)
            _epilogue(
                ck_ref[k_seg - 1, 0], ck_ref[k_seg - 1, 1],
                w_ref, out_ref,
            )

    in_specs = [
        pl.BlockSpec(
            (1, 2, slot_m[op[1]], slot_m[op[1]]),
            lambda v: (v, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for op in slot_steps
    ]
    if fold is not None:
        in_specs.append(pl.BlockSpec(
            (1, n_w, 2), lambda v: (v, 0, 0), memory_space=pltpu.VMEM
        ))
    if is_staged:
        # per-variant resume stages: Mosaic requires rank-1 SMEM blocks
        # be the FULL array (a (1,)-block fails the 128-multiple rule),
        # so every grid step sees the whole [grid] vector and indexes
        # its own entry by program_id
        in_specs.append(pl.BlockSpec(
            (padded,), lambda v: (0,), memory_space=pltpu.SMEM
        ))
    in_specs.append(pl.BlockSpec(
        (2, R, 128), lambda v: (0, 0, 0), memory_space=pltpu.VMEM
    ))

    if fold is None:
        out_specs = pl.BlockSpec(
            (1, R, 128), lambda v: (v, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((padded, R, 128), jnp.float32)
    elif d_keep > LANE_BITS:
        rk = 1 << (d_keep - LANE_BITS)
        out_specs = pl.BlockSpec(
            (1, rk, 128), lambda v: (v, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((padded, rk, 128), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (1, 128), lambda v: (v, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((padded, 128), jnp.float32)

    call = pl.pallas_call(
        kernel_staged if is_staged else kernel,
        grid=(padded,),
        in_specs=in_specs,
        # TPU lowering requires the trailing two block dims be (8k, 128k)
        # or the full array dims — block only the variant axis
        out_specs=out_specs,
        out_shape=out_shape,
        # staged: one checkpoint state per slot segment, persistent
        # across the (sequential) grid — k_seg x 2^n x 8 B of VMEM
        scratch_shapes=[
            pltpu.VMEM(
                (len(slot_steps), 2, R, 128) if is_staged
                else (2, R, 128),
                jnp.float32,
            )
        ],
        # n=18 programs peak ~34 MB of scoped VMEM across the unrolled
        # gate chain (partner/coefficient temporaries) — above the
        # compiler's 16 MB default but within the core's physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    return call, entry_tables, entry_gids, prefix_state, n, R, is_staged


def make_pallas_variant_fn(
    virt: VirtualCircuit, frag_name: str, interpret: bool = False,
):
    """Build ``fn(slot_entries) -> [V, 2^n] probability rows`` (flat
    full-width |psi|^2 — marginalise outside) plus the host-gathered
    per-variant slot-entry arrays.  Returns None when the fragment does
    not fit the kernel."""
    prog = virt.programs[frag_name]
    specs = [vg.spec for vg in virt.vgates]
    strides, n_inst, flat_count = label_strides(specs, prog.touching)
    vidx = variant_index_table(
        prog.touching, strides, n_inst, flat_count, clamp_to=flat_count
    )
    # the grid follows the index table's row count — the A/B probe
    # slices it to bound the full-width row output on big fragments
    padded = int(vidx.shape[0])
    built = _build_call(virt, frag_name, padded, interpret=interpret)
    if built is None:
        return None
    call, entry_tables, entry_gids, prefix_state, n, _R, _st = built
    touch_col = {g: i for i, g in enumerate(prog.touching)}
    slot_inputs = [
        jnp.asarray(tab[vidx[:, touch_col[gid]]])
        for tab, gid in zip(entry_tables, entry_gids)
    ]

    def fn(slot_entries):
        rows = call(*slot_entries, jnp.asarray(prefix_state))
        return rows.reshape(padded, 1 << n)

    meta = {
        "flat_count": flat_count,
        "positions": sorted(prog.clbit_sources),
        "sources": [
            prog.clbit_sources[c] for c in sorted(prog.clbit_sources)
        ],
        "n": n,
    }
    return fn, slot_inputs, meta


def make_chunk_kernel(
    virt: VirtualCircuit, frag_name: str, chunk: int,
    interpret: bool = False, staged: bool = True,
):
    """Streamed-engine integration point: ``(rows_fn, positions)``
    where ``rows_fn(vidx_chunk)`` maps a ``[chunk, num_vgates]``
    per-label variant-index block (traced — the streamed scan's xs,
    columns = GLOBAL vgate ids) to ``[chunk, 2^len(positions)]`` rows
    marginalised onto the written clbits, matching the XLA sim path's
    row contract exactly.  Returns None when the fragment does not fit
    the kernel."""
    built = _build_call(virt, frag_name, chunk, interpret=interpret,
                        staged=staged)
    if built is None:
        return None
    call, entry_tables, entry_gids, prefix_state, n, _R, is_staged = built
    prog = virt.programs[frag_name]
    positions = sorted(prog.clbit_sources)
    sources = [prog.clbit_sources[c] for c in positions]
    tabs_dev = [jnp.asarray(t) for t in entry_tables]
    prefix_dev = jnp.asarray(prefix_state)
    k_seg = len(entry_gids)
    gid_arr = np.asarray(entry_gids, np.int64)

    from .statevector import marginalize_flat

    def rows_fn(vidx_chunk):
        entries = [
            tab[vidx_chunk[:, gid]]
            for tab, gid in zip(tabs_dev, entry_gids)
        ]
        if is_staged:
            # same resume-stage derivation as the folded wrapper:
            # first chain-order slot differing from the previous row
            comp = vidx_chunk[:, gid_arr]
            prev = jnp.concatenate(
                [jnp.full((1, k_seg), -1, comp.dtype), comp[:-1]],
                axis=0,
            )
            dif = comp != prev
            stage = jnp.where(
                dif.any(axis=1), jnp.argmax(dif, axis=1), k_seg
            ).astype(jnp.int32)
            rows = call(*entries, stage, prefix_dev)
        else:
            rows = call(*entries, prefix_dev)
        rows = rows.reshape(chunk, 1 << n)
        return jax.vmap(lambda p: marginalize_flat(p, n, sources))(rows)

    return rows_fn, positions


def make_folded_chunk_kernel(
    virt: VirtualCircuit, frag_name: str, chunk: int,
    interpret: bool = False, keep_clbits=None, z_clbits=None,
    staged: bool = True,
):
    """Fold-fused streamed integration point (r5, VERDICT r4 #3):
    ``(rows_fn, kept_positions)`` where ``rows_fn(vidx_chunk)`` maps a
    ``[chunk, num_vgates]`` label block directly to the FOLDED
    data-width rows ``[chunk, 2^len(kept)]`` — the vgate measure bits
    are weight-contracted, drops summed and z bits sign-contracted
    INSIDE the kernel, so the HBM write per variant is the knit
    contribution (2^d floats) instead of the full 2^n row, and the
    scan body's per-vgate XLA fold passes disappear (they were the
    sup-20 step's dominant non-sim cost, BENCH_TABLE_TPU.md 0.99x row).

    Semantics mirror make_streamed_knit's fold_plans exactly: per
    touching vgate, the measure clbit (num_clbits + g, when written
    here) folds with fold_weights[ti][v] = (w0, w1); non-measuring
    owners multiply by w0; ``keep_clbits`` drops data bits outside the
    set; ``z_clbits`` contracts EVERY data bit ((+1,-1) on the support,
    summed elsewhere — kept_positions is then []).  Output bit j
    carries kept_positions[j] (little-endian, ascending), matching the
    XLA path's layout.  Returns None when the fragment does not fit
    the kernel."""
    from .knit import fold_weights

    prog = virt.programs[frag_name]
    positions = sorted(prog.clbit_sources)
    frag_weights = fold_weights(virt, frag_name)
    w_entries = []
    w_tabs = []
    for ti, g in enumerate(prog.touching):
        cg = virt.num_clbits + g
        w_entries.append((cg if cg in positions else None, ti))
        w_tabs.append(np.asarray(frag_weights[ti], np.float32))
    data_pos = [p for p in positions if p < virt.num_clbits]
    z_list: list[int] = []
    if z_clbits is not None:
        z_list = [p for p in data_pos if p in set(z_clbits)]
        kept: list[int] = []
    elif keep_clbits is not None:
        kept = [p for p in data_pos if p in set(keep_clbits)]
    else:
        kept = list(data_pos)
    built = _build_call(
        virt, frag_name, chunk, interpret=interpret,
        fold={"w": w_entries, "z": z_list, "keep": kept},
        staged=staged,
    )
    if built is None:
        return None
    call, entry_tables, entry_gids, prefix_state, n, _R, is_staged = built
    tabs_dev = [jnp.asarray(t) for t in entry_tables]
    w_dev = [jnp.asarray(t) for t in w_tabs]
    w_gids = list(prog.touching)
    prefix_dev = jnp.asarray(prefix_state)
    d = len(kept)
    k_seg = len(entry_gids)
    gid_arr = np.asarray(entry_gids, np.int64)

    def rows_fn(vidx_chunk):
        entries = [
            tab[vidx_chunk[:, gid]]
            for tab, gid in zip(tabs_dev, entry_gids)
        ]
        if w_dev:
            wstack = jnp.stack([
                w[vidx_chunk[:, g]] for w, g in zip(w_dev, w_gids)
            ], axis=1)
        else:
            wstack = jnp.ones((vidx_chunk.shape[0], 1, 2), jnp.float32)
        if is_staged:
            # resume stage = first chain-order slot whose component
            # differs from the PREVIOUS row (row 0: full replay);
            # k_seg when nothing changed (checkpoints all valid, only
            # the epilogue re-runs with this label's weights)
            comp = vidx_chunk[:, gid_arr]
            prev = jnp.concatenate(
                [jnp.full((1, k_seg), -1, comp.dtype), comp[:-1]],
                axis=0,
            )
            dif = comp != prev
            stage = jnp.where(
                dif.any(axis=1), jnp.argmax(dif, axis=1), k_seg
            ).astype(jnp.int32)
            out = call(*entries, wstack, stage, prefix_dev)
        else:
            out = call(*entries, wstack, prefix_dev)
        if d > LANE_BITS:
            return out.reshape(vidx_chunk.shape[0], 1 << d)
        return out[:, : 1 << d]

    return rows_fn, kept


def _finalize_plan_collapse(sim_one):
    """Hoist every remaining lazy-width "ins" step of a collapse-mode
    plan into the host prefix and translate all surviving steps' axes to
    FINAL active positions -> (prefix_state [2, 2^n], steps, n).

    A lazily-introduced qubit has no ops before its "ins", so tensoring
    its |0> bit in early commutes with every intervening step on other
    qubits — the kernel then runs shape-static at the final width (the
    whole point: the state lives in VMEM, width changes would re-tile
    it)."""
    plan = sim_one.run_plan
    m0 = sim_one.prefix_width
    st = np.asarray(sim_one.prefix_state, np.float32)
    active: list[int] = list(range(m0))
    nxt = m0
    translated = []  # (kind, payload, token_axes)
    for stp in plan:
        if stp[0] == "ins":
            pos = stp[1]
            r = st.reshape(2, 1 << pos, -1)
            st = np.stack([r, np.zeros_like(r)], axis=2).reshape(2, -1)
            active.insert(pos, nxt)
            nxt += 1
        else:
            translated.append(
                (stp[0], stp[1], tuple(active[a] for a in stp[2]))
            )
    final_pos = {tok: i for i, tok in enumerate(active)}
    steps = [
        (k, p, tuple(final_pos[t] for t in toks))
        for k, p, toks in translated
    ]
    n = len(active)
    return st.reshape(2, 1 << n), steps, n


def _bcast_lab(v, B, R_):
    """(B, 1, 1) per-label scalar -> (B, R_, 128): a lane broadcast
    followed by a ``pltpu.repeat`` over sublanes.  Mosaic has no
    combined sublane+lane vector.broadcast (measured on the v5e: 'Not
    implemented: Broadcast in both sublanes and lanes'), and staging it
    as two ``broadcast_to``s does not survive MLIR canonicalization
    (broadcast-of-broadcast folds back into one) — ``tpu.repeat`` is a
    distinct op the folder cannot merge."""
    v = jnp.broadcast_to(v, (B, 1, 128))
    if R_ == 1:
        return v
    return pltpu.repeat(v, R_, 1)


def _apply_1q_lab(re, im, j, BR, B, ur, ui):
    """1q gate with PER-LABEL coefficients: state ``[BR, 128]`` stacks B
    labels on the HIGH row bits (in-label flat bits only ever read the
    low ``log2(BR/B)`` row bits, so :func:`_bitval`/:func:`_partner`
    are label-safe unchanged); ``ur/ui(r, c)`` return ``(B, 1, 1)``
    arrays broadcast against the ``(B, R, 128)`` state view."""
    R_ = BR // B
    b = _bitval(j, BR).reshape(B, R_, 128)
    re3 = re.reshape(B, R_, 128)
    im3 = im.reshape(B, R_, 128)

    def e(r, c):
        return _bcast_lab(ur(r, c), B, R_)

    def f(r, c):
        return _bcast_lab(ui(r, c), B, R_)

    kr = jnp.where(b == 1, e(1, 1), e(0, 0))
    ki = jnp.where(b == 1, f(1, 1), f(0, 0))
    nre = kr * re3 - ki * im3
    nim = kr * im3 + ki * re3
    sr = jnp.where(b == 1, e(1, 0), e(0, 1))
    si = jnp.where(b == 1, f(1, 0), f(0, 1))
    pre = _partner(re, j, BR).reshape(B, R_, 128)
    pim = _partner(im, j, BR).reshape(B, R_, 128)
    nre = nre + sr * pre - si * pim
    nim = nim + sr * pim + si * pre
    return nre.reshape(BR, 128), nim.reshape(BR, 128)


def _build_call_collapse(virt: VirtualCircuit, frag_name: str,
                         grid_count: int, interpret: bool = False,
                         batch: int = 1, keep_clbits=None,
                         z_sets=None):
    """Collapse-mode twin of :func:`_build_call`: grid over SAMPLED
    LABELS, each kernel invocation simulates one label's instance with
    mid-circuit measure-and-collapse (ops/variant_engine.collapse_qubit
    semantics, branch picked by a per-label uniform draw) executed
    IN-KERNEL — the whole point of collapse mode (state width stays at
    the data qubits; qft-16's 15-cut fragment runs at 2^15 instead of
    the ancilla path's 2^30) compounds with the whole point of this
    kernel (state resident in VMEM, one HBM row write per label).

    Returns ``(call, entry_tables, entry_gids, site_meta, prefix_state,
    n, R, positions, active_final, sources)`` or None when the fragment
    does not fit.  ``call(*entries, cscal, prefix)`` takes per-label
    slot-entry blocks ``[grid, 2, 2, 2]`` (one per slot_pre/slot_post
    step, gather key = ``entry_gids[k]``'s label component), a
    ``[grid, n_sites, 4]`` per-label collapse-scalar block (u, mflag,
    w0, w1 per site — see site_meta: (slot_id, vgate_idx) in plan
    order), and the shared prefix; rows come back as full-width
    ``[grid, R, 128]`` probabilities PRE-MULTIPLIED by the sampled fold
    weights (qpd_sampling._collapse_row_builder's contract).

    ``batch``: labels simulated per grid step, stacked on the HIGH row
    bits of the VMEM state ``[2, batch*R, 128]``.  At small fragment
    widths one label's gate op touches only ``R x 128`` elements and is
    per-op-overhead-bound; batching amortises that overhead ``batch``-x
    (the qft-16 flagship: n=15 => R=256, ops are ~us-scale on ~100-op
    chains).  Must divide ``grid_count``; the width gate applies to the
    EFFECTIVE width ``n + log2(batch) <= 20`` (the measured n=21 VMEM
    boundary).

    ``keep_clbits``: when given (and the kept outcome count is <= 128),
    the MARGINAL over the kept data clbits is computed IN-KERNEL by
    masked reductions and the output shrinks to ``[grid, 128]`` rows
    (first ``2^|kept|`` lanes meaningful, column order exactly
    qpd_sampling._marginalize_rows') — the HBM row write AND the
    tunneled backend's buffer-size compile constraint disappear, so the
    sampled scan can run far larger label blocks.  Returns None when
    the kept set needs > 128 lanes (callers fall back to full rows)."""
    from .variant_engine import make_sim_fn

    prog = virt.programs[frag_name]
    specs = [vg.spec for vg in virt.vgates]
    sim_one, _, positions, _ = make_sim_fn(
        virt, frag_name, build_matrices=False, collapse=True,
        fuse_qubits=2,
    )
    prefix_state, steps, n = _finalize_plan_collapse(sim_one)
    B = max(1, int(batch))
    if grid_count % B or B & (B - 1):
        raise ValueError(
            f"batch {B} must be a power of 2 dividing grid {grid_count}"
        )
    if (n < LANE_BITS + 1 or n > 20
            or n + (B.bit_length() - 1) > 20):
        return None
    R = 1 << (n - LANE_BITS)
    BR = B * R
    prefix_state = np.broadcast_to(
        prefix_state.reshape(2, 1, R, 128), (2, B, R, 128)
    ).reshape(2, BR, 128).copy()

    # in-kernel marginal map: kept clbit j' -> flat state bit (or None
    # for structurally-|0> sources), mirroring make_collapse_chunk_
    # kernel's marginalize_flat + zero-splice + _marginalize_rows
    # composition exactly (little-endian: out bit j' carries kept[j'])
    marg_bits = None
    kept = None
    kk = 0
    if keep_clbits is not None:
        if z_sets is not None:
            raise ValueError("keep_clbits and z_sets are exclusive")
        keep_set = set(keep_clbits)
        kept = [p for p in positions if p in keep_set]
        kk = len(kept)
        if (1 << kk) > 128:
            return None
        act = list(sim_one.active_final)
        src = list(sim_one.sources)
        marg_bits = [
            (n - 1 - act.index(src[positions.index(p)]))
            if src[positions.index(p)] in act else None
            for p in kept
        ]
    # in-kernel Z-observable map: per z-set, the flat state bits whose
    # parity signs this fragment's contribution (positions in the set
    # with structurally-|0> sources contribute +1 and are skipped) —
    # mirrors knit._z_sign_matrix on the full-rows route.  Column n_z
    # carries the PLAIN total (the control-variate Y statistic).
    z_fbs = None
    if z_sets is not None:
        if len(z_sets) + 1 > 128:
            return None
        act = list(sim_one.active_final)
        src = list(sim_one.sources)
        z_fbs = []
        for s_z in z_sets:
            s_z = set(s_z)
            z_fbs.append([
                n - 1 - act.index(src[j])
                for j, p in enumerate(positions)
                if p in s_z and src[j] in act
            ])

    tables = _slot_tables(prog, specs, fused=False)
    entry_steps = [s for s in steps if s[0] in ("slot_pre", "slot_post")]
    entry_tables = []
    entry_gids = []
    for s in entry_steps:
        sid = s[1]
        tab = tables[sid][0 if s[0] == "slot_pre" else 2]
        cx = np.stack([_to_complex(t) for t in tab])  # [nI, 2, 2]
        entry_tables.append(
            np.stack([cx.real, cx.imag], axis=1).astype(np.float32)
        )
        entry_gids.append(prog.slots[sid].vgate_idx)

    site_meta = [
        (s[1], prog.slots[s[1]].vgate_idx)
        for s in steps if s[0] == "collapse"
    ]
    n_sites = max(1, len(site_meta))

    def kernel(*refs):
        e_refs = refs[: len(entry_steps)]
        c_ref = refs[len(entry_steps)]
        prefix_ref = refs[len(entry_steps) + 1]
        out_ref = refs[len(entry_steps) + 2]
        st_ref = refs[len(entry_steps) + 3]
        st_ref[0] = prefix_ref[0]
        st_ref[1] = prefix_ref[1]
        weight = jnp.ones((B, 1, 1), jnp.float32)
        ei = 0
        ci = 0
        for op in steps:
            re = st_ref[0]
            im = st_ref[1]
            if op[0] == "collapse":
                # collapse_qubit semantics, VMEM-resident: Born pick of
                # one branch at the per-label draw, project + rescale by
                # sqrt(tot/p_b), fold weight w_b (variant_engine.py:265)
                # — all per-label (B, 1, 1) scalars against the
                # (B, R, 128) state view
                j = n - 1 - op[2][0]
                b1 = _bitval(j, BR).astype(jnp.float32).reshape(
                    B, R, 128
                )
                sq = (re * re + im * im).reshape(B, R, 128)
                tot = jnp.sum(
                    jnp.sum(sq, axis=2, keepdims=True),
                    axis=1, keepdims=True,
                )
                p1 = jnp.sum(
                    jnp.sum(sq * b1, axis=2, keepdims=True),
                    axis=1, keepdims=True,
                )
                p0 = tot - p1
                u = c_ref[:, ci:ci + 1, 0:1]
                mflag = c_ref[:, ci:ci + 1, 1:2]
                w0 = c_ref[:, ci:ci + 1, 2:3]
                w1 = c_ref[:, ci:ci + 1, 3:4]
                ci += 1
                b = (u * tot >= p0).astype(jnp.float32)
                pb = p0 + b * (p1 - p0)
                scale = jnp.sqrt(tot / jnp.maximum(pb, 1e-30))
                # (B,1,1) -> (B,R,128) via the STAGED broadcast only
                be = _bcast_lab(b, B, R)
                keep = b1 * be + (1.0 - b1) * (1.0 - be)
                fac = jnp.where(_bcast_lab(mflag, B, R) > 0,
                                keep * _bcast_lab(scale, B, R),
                                jnp.ones_like(keep))
                st_ref[0] = (re.reshape(B, R, 128) * fac).reshape(
                    BR, 128
                )
                st_ref[1] = (im.reshape(B, R, 128) * fac).reshape(
                    BR, 128
                )
                weight = weight * jnp.where(
                    mflag > 0, w0 + b * (w1 - w0),
                    jnp.ones_like(w0),
                )
                continue
            if op[0] == "u":
                cxm = _to_complex(np.asarray(op[1]))
                axes = op[2]
                js = [n - 1 - q for q in axes]
                ur = lambda r, c, M=cxm: float(M[r, c].real)
                ui = lambda r, c, M=cxm: float(M[r, c].imag)
            else:  # slot_pre / slot_post: per-label 1q entries
                ref = e_refs[ei]
                ei += 1
                axes = op[2]
                js = [n - 1 - q for q in axes]
                ur = lambda r, c, _r=ref: _r[:, 0:1, r, c:c + 1]
                ui = lambda r, c, _r=ref: _r[:, 1:2, r, c:c + 1]
                re, im = _apply_1q_lab(re, im, js[0], BR, B, ur, ui)
                st_ref[0] = re
                st_ref[1] = im
                continue
            if len(axes) == 1:
                if js[0] >= LANE_BITS:
                    re, im = _apply_1q_row(re, im, js[0], BR, ur, ui)
                else:
                    re, im = _apply_1q(re, im, js[0], BR, ur, ui)
            elif min(js) >= LANE_BITS:
                re, im = _apply_2q_rowrow(re, im, js[0], js[1], BR,
                                          ur, ui)
            else:
                re, im = _apply_2q(re, im, js[0], js[1], BR, ur, ui)
            st_ref[0] = re
            st_ref[1] = im
        re = st_ref[0]
        im = st_ref[1]
        sq = (re * re + im * im).reshape(B, R, 128)
        if marg_bits is None and z_fbs is None:
            out_ref[...] = sq * _bcast_lab(weight, B, R)
            return

        def _tot(v):
            return jnp.sum(
                jnp.sum(v, axis=2, keepdims=True),
                axis=1, keepdims=True,
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        out = jnp.zeros((B, 128), jnp.float32)
        if marg_bits is not None:
            # masked reductions: outcome index per state position, then
            # one (B, 1, 1) sum per kept outcome on the lane axis
            kmap = jnp.zeros((B, R, 128), jnp.int32)
            for j, fb in enumerate(marg_bits):
                if fb is not None:
                    kmap = kmap + (
                        _bitval(fb, BR).reshape(B, R, 128) << j
                    )
            for k in range(1 << kk):
                mk = (kmap == k).astype(jnp.float32)
                s = _tot(sq * mk)
                out = out + jnp.where(
                    lane == k, s.reshape(B, 1), jnp.float32(0.0)
                )
        else:
            # signed reductions per z-set; column n_z = plain total
            for zi, fbs in enumerate(z_fbs):
                sm = None
                for fb in fbs:
                    f = 1.0 - 2.0 * _bitval(fb, BR).astype(
                        jnp.float32
                    ).reshape(B, R, 128)
                    sm = f if sm is None else sm * f
                s = _tot(sq if sm is None else sq * sm)
                out = out + jnp.where(
                    lane == zi, s.reshape(B, 1), jnp.float32(0.0)
                )
            s = _tot(sq)
            out = out + jnp.where(
                lane == len(z_fbs), s.reshape(B, 1), jnp.float32(0.0)
            )
        out_ref[...] = out * weight.reshape(B, 1)

    in_specs = [
        pl.BlockSpec(
            (B, 2, 2, 2), lambda v: (v, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        for _ in entry_steps
    ] + [
        pl.BlockSpec(
            (B, n_sites, 4), lambda v: (v, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (2, BR, 128), lambda v: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]

    if marg_bits is None and z_fbs is None:
        out_specs = pl.BlockSpec(
            (B, R, 128), lambda v: (v, 0, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct(
            (grid_count, R, 128), jnp.float32
        )
    else:
        out_specs = pl.BlockSpec(
            (B, 128), lambda v: (v, 0), memory_space=pltpu.VMEM
        )
        out_shape = jax.ShapeDtypeStruct((grid_count, 128), jnp.float32)

    call = pl.pallas_call(
        kernel,
        grid=(grid_count // B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, BR, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )

    return (call, entry_tables, entry_gids, site_meta, prefix_state, n,
            R, positions, list(sim_one.active_final),
            list(sim_one.sources), kept)


def make_collapse_chunk_kernel(
    virt: VirtualCircuit, frag_name: str, chunk: int,
    interpret: bool = False, keep_clbits=None, z_sets=None,
):
    """Sampled-engine integration point (collapse mode):
    ``(rows_fn, positions, site_meta)`` where ``rows_fn(lab_chunk,
    cscal_chunk)`` maps a ``[chunk, G]`` global label block plus a
    ``[chunk, n_sites, 4]`` collapse-scalar block (u, mflag, w0, w1 per
    site, order = site_meta) to ``[chunk, 2^len(positions)]`` rows —
    weight-folded, marginalised onto the DATA clbits, matching
    qpd_sampling._collapse_row_builder's row contract exactly.  Returns
    None when the fragment does not fit the kernel.

    Labels are batched into the kernel's row dimension: the largest
    power-of-2 ``batch`` dividing ``chunk`` with effective width
    ``n + log2(batch) <= 20`` (amortises the per-op overhead that
    dominates narrow fragments — qft-16's n=15 chain is ~us-scale ops,
    measured 15 ms per 16-label block unbatched).

    ``keep_clbits``: build the IN-KERNEL-MARGINAL variant — rows come
    back as ``[chunk, 2^|kept|]`` (kept = positions in keep_clbits,
    ascending), the exact output of the full-rows path composed with
    qpd_sampling._marginalize_rows, and ``positions`` is the kept list.
    The kernel's HBM output is 128 floats/label, so callers can scan
    far larger label blocks without tripping the tunneled backend's
    buffer-size compile scaling.

    ``z_sets``: build the IN-KERNEL Z-OBSERVABLE variant — rows come
    back as ``[chunk, len(z_sets) + 1]``: column zi is this fragment's
    signed contribution ``rows_full @ z_sign_matrix[:, zi]`` and the
    LAST column is the plain row total (the control-variate Y
    statistic); ``positions`` stays the full data-clbit list."""
    built = _build_call_collapse(virt, frag_name, chunk,
                                 interpret=interpret,
                                 keep_clbits=keep_clbits,
                                 z_sets=z_sets)
    if built is None:
        return None
    n_frag = built[5]
    batch = 1
    while (batch * 2 <= chunk and chunk % (batch * 2) == 0
           and n_frag + (batch * 2).bit_length() - 1 <= 20):
        batch *= 2
    if batch > 1:
        built = _build_call_collapse(
            virt, frag_name, chunk, interpret=interpret, batch=batch,
            keep_clbits=keep_clbits, z_sets=z_sets,
        )
    (call, entry_tables, entry_gids, site_meta, prefix_state, n, _R,
     positions, active_final, sources, kept) = built
    tabs_dev = [jnp.asarray(t) for t in entry_tables]
    prefix_dev = jnp.asarray(prefix_state)

    from .statevector import marginalize_flat

    act_sources = [q for q in sources if q in active_final]
    act_idx = [active_final.index(q) for q in act_sources]

    if z_sets is not None:
        n_z = len(z_sets)

        def rows_fn(lab_chunk, cscal_chunk):
            entries = [
                tab[lab_chunk[:, gid]]
                for tab, gid in zip(tabs_dev, entry_gids)
            ]
            out = call(*entries, cscal_chunk, prefix_dev)
            return out[:, : n_z + 1]

        return rows_fn, positions, site_meta

    if kept is not None:

        def rows_fn(lab_chunk, cscal_chunk):
            entries = [
                tab[lab_chunk[:, gid]]
                for tab, gid in zip(tabs_dev, entry_gids)
            ]
            out = call(*entries, cscal_chunk, prefix_dev)
            return out[:, : 1 << len(kept)]

        return rows_fn, list(kept), site_meta

    def rows_fn(lab_chunk, cscal_chunk):
        entries = [
            tab[lab_chunk[:, gid]]
            for tab, gid in zip(tabs_dev, entry_gids)
        ]
        full = call(*entries, cscal_chunk, prefix_dev)
        full = full.reshape(chunk, 1 << n)
        rows = jax.vmap(
            lambda p: marginalize_flat(p, n, act_idx)
        )(full)
        # splice deterministic |0> bits for sources with no ops
        # (finish_row's zero-bit rule, variant_engine.py:379)
        for j, q in enumerate(sources):
            if q not in active_final:
                r = rows.reshape(chunk, -1, 1 << j)
                rows = jnp.stack(
                    [r, jnp.zeros_like(r)], axis=2
                ).reshape(chunk, -1)
        return rows

    return rows_fn, positions, site_meta


def run_fragment_pallas_variant(
    virt: VirtualCircuit, frag_name: str, interpret: bool = False,
) -> FragmentResult | None:
    """Execute one fragment's fan-out through the VMEM kernel and return
    the standard FragmentResult (rows marginalised to the written
    clbits in XLA — one cheap pass over the kernel's output)."""
    built = make_pallas_variant_fn(virt, frag_name, interpret=interpret)
    if built is None:
        return None
    fn, slot_entries, meta = built
    rows_full = fn(slot_entries)

    from .statevector import marginalize_flat

    n = meta["n"]
    sources = meta["sources"]

    @jax.jit
    def finish(rows):
        return jax.vmap(
            lambda p: marginalize_flat(p, n, sources)
        )(rows)

    rows = np.asarray(finish(rows_full))[: meta["flat_count"]]
    prog = virt.programs[frag_name]
    return FragmentResult(
        frag_name, rows, meta["positions"], list(prog.touching)
    )
