"""HBM-resident blocked variant kernel: past the VMEM width boundary.

The whole-variant-in-VMEM kernel (ops/pallas_variant.py) is gated at
n <= 20 sim qubits — n=21 needs 166 MB of VMEM vs the v5e's 128 MB
physical (the MEASURED r4 boundary, PERF.md).  This module serves
n = 21..24 single-chip (the r4 VERDICT action #2b): the per-variant
state lives in HBM as ``[2, n_blocks, R_w, 128]`` and the gate chain is
SEGMENTED —

  * a greedy lookahead planner (:func:`plan_segments`) groups
    consecutive ops whose qubits fit a ``w``-bit window and assigns
    those qubits to the low ``w`` flat bits of a per-segment layout;
  * each segment executes as ONE Pallas kernel: grid over the 2^(n-w)
    blocks, each block resident in VMEM while ALL the segment's gates
    apply (the same XOR-pairing appliers as the VMEM kernel — flat bits
    < w by construction), then written back once;
  * between segments, one ``permute_bits_flat`` pass (XLA) re-tiles the
    state to the next segment's layout.

HBM traffic per variant: ~2 passes per segment + 2 per permute + the
finish, instead of 2 passes per GATE at 3x XLA's einsum inflation —
the analytic win grows with ops/segment (syc-36-class fragments: ~30
ops in 3-6 segments).  Beyond capability, n = 22..24 is territory the
XLA scan CANNOT run at all single-chip (the rank-7 transpose-tiling
OOM measured on syc-40, BENCH_TABLE.md) — here only the gate appliers
change layout; the permutes are bounded-rank by construction.

Width gate: LANE_BITS+1 <= w <= 20 (block fits VMEM), n > w (else use
ops/pallas_variant directly), n <= 24 (host prefix + per-variant HBM
state at 2^24 x 8 B = 128 MB stays practical).  Exact f32 path only;
correctness locked by interpret-mode differentials in
tests/test_pallas_blocked.py.

Reference role: the Aer statevector executor (qvm/run.py:36-42) at
widths the reference never reached.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..virt.virtual_circuit import VirtualCircuit
from .pallas_variant import (
    LANE_BITS,
    _apply_1q,
    _apply_1q_row,
    _apply_2q,
    _apply_2q_rowrow,
    _plan_ops,
    _slot_tables,
    _to_complex,
)


def plan_segments(ops, n: int, w: int):
    """Greedy lookahead segmentation of a full-width op stream.

    ``ops``: [("u", mat, qubit_axes) | ("slot", sid, qubit_axes)].
    Returns ``segments = [(perm, seg_ops)]`` where ``perm`` maps qubit
    -> flat bit for that segment (every seg op's qubits map < w) and
    ``seg_ops`` keep QUBIT axes (the executor translates).  The first
    segment's perm is also the required input layout.
    """
    assert w < n
    segments = []
    i = 0
    cur_perm = None
    while i < len(ops):
        # lookahead: largest op prefix whose qubit union fits the window
        qubits: list[int] = []
        j = i
        while j < len(ops):
            extra = [q for q in ops[j][2] if q not in qubits]
            if len(qubits) + len(extra) > w:
                break
            qubits.extend(extra)
            j += 1
        assert j > i, f"op {ops[i]} touches more than w={w} qubits"
        # build the segment's perm: scheduled qubits -> low bits (keep
        # positions stable from the previous perm where already low)
        perm = {}
        used = set()
        if cur_perm is not None:
            for q in qubits:
                if cur_perm[q] < w:
                    perm[q] = cur_perm[q]
                    used.add(cur_perm[q])
        free = [b for b in range(n) if b not in used]
        fi = 0
        for q in qubits:
            if q not in perm:
                while free[fi] >= w:
                    fi += 1
                perm[q] = free[fi]
                used.add(free[fi])
                fi += 1
        rest = [b for b in range(n) if b not in used]
        ri = 0
        for q in range(n):
            if q not in perm:
                perm[q] = rest[ri]
                ri += 1
        segments.append((perm, ops[i:j]))
        cur_perm = perm
        i = j
    return segments


def _perm_dst_bits(prev: dict, nxt: dict, n: int) -> list[int]:
    """permute_bits_flat DST order taking layout ``prev`` to ``nxt``
    with bit labels = prev-layout flat positions: the input's bit j
    carries label j (src_bits = range(n)); output bit j must carry the
    prev-flat position of the qubit that layout ``nxt`` puts on bit j."""
    inv_next = {fb: q for q, fb in nxt.items()}
    return [prev[inv_next[j]] for j in range(n)]


def _segment_call(seg_ops, flat_axes, w: int, slot_ms: list,
                  n_blocks: int, interpret: bool):
    """One segment's Pallas kernel: ``call(*entries, state) -> state``
    with state ``[2, n_blocks, R_w, 128]`` (input/output aliased) and
    per-variant slot entries ``[2, m, m]`` for this segment's slots."""
    R_w = 1 << (w - LANE_BITS)
    n_slots = len(slot_ms)

    def kernel(*refs):
        e_refs = refs[:n_slots]
        in_ref = refs[n_slots]
        out_ref = refs[n_slots + 1]
        re = in_ref[0, 0]
        im = in_ref[1, 0]
        si = 0
        for (op, js) in zip(seg_ops, flat_axes):
            if op[0] == "u":
                mat = op[1]
                ur = lambda r, c, M=mat: float(M[r, c].real)
                ui = lambda r, c, M=mat: float(M[r, c].imag)
            else:
                ref = e_refs[si]
                si += 1
                ur = lambda r, c, _r=ref: _r[0, r, c]
                ui = lambda r, c, _r=ref: _r[1, r, c]
            if len(js) == 1:
                if js[0] >= LANE_BITS:
                    re, im = _apply_1q_row(re, im, js[0], R_w, ur, ui)
                else:
                    re, im = _apply_1q(re, im, js[0], R_w, ur, ui)
            elif min(js) >= LANE_BITS:
                re, im = _apply_2q_rowrow(re, im, js[0], js[1], R_w,
                                          ur, ui)
            else:
                re, im = _apply_2q(re, im, js[0], js[1], R_w, ur, ui)
        out_ref[0, 0] = re
        out_ref[1, 0] = im

    in_specs = [
        pl.BlockSpec((2, m, m), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM)
        for m in slot_ms
    ] + [
        pl.BlockSpec((2, 1, R_w, 128), lambda b: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((2, 1, R_w, 128), lambda b: (0, b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, n_blocks, R_w, 128),
                                       jnp.float32),
        input_output_aliases={n_slots: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )


def make_blocked_chunk_kernel(
    virt: VirtualCircuit, frag_name: str, chunk: int,
    window: int = 18, interpret: bool = False,
    force: bool = False,
):
    """Streamed-engine integration point for n > 20 fragments:
    ``(rows_fn, positions)`` with the same contract as
    ops/pallas_variant.make_chunk_kernel — ``rows_fn(vidx_chunk)`` maps
    a ``[chunk, num_vgates]`` label block to ``[chunk,
    2^len(positions)]`` marginalised rows — but the per-label state is
    HBM-resident and the gate chain runs as segmented VMEM-block
    kernels with permute_bits_flat re-tiling between segments (module
    docstring).  Labels execute sequentially in a ``lax.scan`` (one
    16-128 MB state alive at a time).  Returns None when the fragment
    is outside the n = 21..24 gate (``force=True`` lifts the lower
    bound for CPU-scale interpret tests)."""
    from .bits import permute_bits_flat
    from .statevector import apply_matrix_host, marginalize_flat

    prefix_ops, suffix, prog = _plan_ops(virt, frag_name)
    specs = [vg.spec for vg in virt.vgates]
    n = prog.num_sim_qubits
    w = min(window, n - 1)
    if not force and not (20 < n <= 24):
        return None
    if w < LANE_BITS + 1 or w > 20:
        return None

    segments = plan_segments(suffix, n, w)
    init_perm = segments[0][0]

    # host prefix in the FIRST segment's layout (qubit q on flat bit
    # perm[q]; apply_matrix_host's qubit q' sits on flat bit n-1-q')
    st = np.zeros((2, 1 << n), np.float32)
    st[0, 0] = 1.0
    for op in prefix_ops:
        st = apply_matrix_host(
            st, op[1], tuple(n - 1 - init_perm[q] for q in op[2]), n
        )
    n_blocks = 1 << (n - w)
    R_w = 1 << (w - LANE_BITS)
    prefix_state = st.reshape(2, n_blocks, R_w, 128)

    # per-segment slot-entry tables + the compiled segment calls
    fused_tabs = _slot_tables(prog, specs, fused=True)
    seg_calls = []
    seg_entry_tabs = []  # per segment: [(table [nI,2,m,m], gid)]
    for (perm, seg_ops) in segments:
        flat_axes = [tuple(perm[q] for q in op[2]) for op in seg_ops]
        ms = []
        tabs = []
        ops_k = []
        for op in seg_ops:
            if op[0] == "slot":
                sid = op[1]
                tab = fused_tabs[sid][0]
                m = tab.shape[2]
                cx = np.stack([_to_complex(t) for t in tab])
                tabs.append((
                    np.stack([cx.real, cx.imag], axis=1).astype(
                        np.float32
                    ),
                    prog.slots[sid].vgate_idx,
                ))
                ms.append(m)
                ops_k.append(("slot", sid, op[2]))
            else:
                ops_k.append(("u", op[1], op[2]))
        seg_calls.append(_segment_call(
            ops_k, flat_axes, w, ms, n_blocks, interpret
        ))
        seg_entry_tabs.append(tabs)

    # inter-segment re-tiling permutations (flat-bit source orders)
    perms = [s[0] for s in segments]
    retiles = [
        _perm_dst_bits(perms[k], perms[k + 1], n)
        for k in range(len(perms) - 1)
    ]
    # final layout -> qubit order (marginalize_flat expects qubit q on
    # flat bit n-1-q): permute back to the canonical layout
    final_perm = perms[-1]
    canonical = {q: n - 1 - q for q in range(n)}
    final_dst = _perm_dst_bits(final_perm, canonical, n)

    positions = sorted(prog.clbit_sources)
    sources = [prog.clbit_sources[c] for c in positions]
    tabs_dev = [
        [(jnp.asarray(t), gid) for (t, gid) in tabs]
        for tabs in seg_entry_tabs
    ]
    prefix_dev = jnp.asarray(prefix_state)

    def one_label(lab_row):
        state = prefix_dev
        for k, call in enumerate(seg_calls):
            entries = [
                tab[lab_row[gid]] for (tab, gid) in tabs_dev[k]
            ]
            state = call(*entries, state)
            if k < len(retiles):
                flat = state.reshape(2, 1 << n)
                flat = jax.vmap(
                    lambda v, db=retiles[k]: permute_bits_flat(
                        v, list(range(n)), db
                    )
                )(flat)
                state = flat.reshape(2, n_blocks, R_w, 128)
        flat = state.reshape(2, 1 << n)
        flat = jax.vmap(
            lambda v: permute_bits_flat(v, list(range(n)), final_dst)
        )(flat)
        p = flat[0] * flat[0] + flat[1] * flat[1]
        return marginalize_flat(p, n, sources)

    def rows_fn(vidx_chunk):
        _, rows = jax.lax.scan(
            lambda _, lab: (None, one_label(lab)), None, vidx_chunk
        )
        return rows

    return rows_fn, positions
