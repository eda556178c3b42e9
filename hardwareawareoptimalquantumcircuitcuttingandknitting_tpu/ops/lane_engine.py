"""Lane-layout variant execution: the chunk axis on the TPU lane axis.

The streamed/batched engines run ``jax.vmap(sim_one)`` with the variant
chunk as the LEADING axis, so each per-gate einsum works on tensors whose
minor-most dims are state bit-slices.  On TPU the minor-most dim maps to
the 128-wide lane axis — and a gate on a low-significance qubit leaves a
trailing slice of size ``2^(n-1-q) < 128`` that XLA pads up to full
lanes, wasting up to two orders of magnitude of HBM bandwidth on the
worst gates (the analytic model in ops/roofline.py counts unpadded
bytes; the measured gap on the v5e is 3.6-9.7x).

Here the same execution plan (``make_sim_fn``'s lazy-width step list —
shared, not re-derived) runs with the chunk axis TRAILING: the state is
``[2, 2^m, C]``, every einsum keeps ``C`` as the minor-most label, so the
lane axis is always a full, aligned ``C >= 128`` and bit-slice dims land
on sublanes (8-wide padding at worst).  This is the Pallas kernel's
variants-on-lanes layout (ops/pallas_sv.py) expressed in plain XLA —
no Mosaic compile, works at any width the XLA engine works at.

``make_lane_sim`` returns a chunk-level function: per-slot variant
matrices arrive as ``[C, ...]`` gathered tables (same tables as the
streamed path) and the result is ``[2^k, C]`` probability rows —
``vmap(sim_one)(mats).T`` exactly (differential-tested).
"""
from __future__ import annotations

import string

import jax.numpy as jnp
import numpy as np

from ..virt.virtual_circuit import VirtualCircuit


def _gate_subscripts(k: int):
    """(block_sub, state_sub, out_sub) einsum labels for a k-qubit gate on
    a ``[2(re/im), bits..., C]`` state; 'c' is reserved for the chunk/lane
    axis, 'x'/'y' for the real-rep component axes."""
    pool = [ch for ch in string.ascii_letters if ch not in "xyc"]
    assert 3 * k + 1 <= len(pool), f"fused block too wide: k={k}"
    outs, ins = pool[:k], pool[k:2 * k]
    gaps = pool[2 * k:3 * k + 1]
    block = "x" + "".join(outs) + "y" + "".join(ins)
    state = "y"
    out = "x"
    for i in range(k):
        state += gaps[i] + ins[i]
        out += gaps[i] + outs[i]
    state += gaps[k] + "c"
    out += gaps[k] + "c"
    return block, state, out


def _bit_shape(axes_sorted, m: int, tail: int):
    """State reshape splitting out each gate bit: [2, g0, 2, g1, 2, ...,
    gk, tail]."""
    shape = [2]
    prev = -1
    for q in axes_sorted:
        shape += [1 << (q - prev - 1), 2]
        prev = q
    shape += [1 << (m - 1 - axes_sorted[-1]), tail]
    return tuple(shape)


def _block_perm(block, k: int, axes, xp):
    """Permute a [..., 2, 2^k-as-bits..., 2, bits...] block's qubit slots
    to ascending axis order (same rule as ops/statevector._kq_operands);
    ``block`` may carry a leading variant axis (ndim == 2k+3)."""
    order = sorted(range(k), key=lambda i: axes[i])
    if order == list(range(k)):
        return block
    lead = block.ndim - (2 * k + 2)  # 0 (const) or 1 (variant axis)
    perm = list(range(lead))
    perm += [lead] + [lead + 1 + p for p in order]
    perm += [lead + k + 1] + [lead + k + 2 + p for p in order]
    return xp.transpose(block, perm)


def apply_lane(state, block, axes, m: int, variant_axis: bool):
    """Apply one gate/slot block to a ``[2, 2^m, C]`` lane-layout state.

    ``block``: real block ``[2, d, 2, d]`` (trace-time constant) or
    ``[C, 2, d, 2, d]`` per-variant (``variant_axis=True``), d = 2^k.
    """
    from .statevector import (
        _apply_const_slices,
        _diag_broadcast,
        diag_of_block,
    )

    k = len(axes)
    if not variant_axis:
        C = state.shape[-1]
        if (
            isinstance(block, np.ndarray) and k <= 3
            and C & (C - 1) == 0
        ):
            # the trailing chunk axis folds into the final gap dim: a
            # [2, 2^m, C] lane state IS a [2, 2^(m+log2 C)] state whose
            # gates act on the same high axes — reuse the slice-combine
            # fast path unchanged
            out = _apply_const_slices(
                state.reshape(2, -1), block, axes,
                m + (C.bit_length() - 1),
            )
            return out.reshape(2, 1 << m, C)
    if not variant_axis:
        dg = diag_of_block(
            block if isinstance(block, np.ndarray) else None
        )
        if dg is not None:
            qs = sorted(axes)
            shape = []
            prev = -1
            for q in qs:
                shape += [1 << (q - prev - 1), 2]
                prev = q
            shape += [1 << (m - 1 - qs[-1]), state.shape[-1]]
            st = state.reshape((2,) + tuple(shape))
            re, im = st[0], st[1]
            drb = jnp.asarray(_diag_broadcast(dg[0], axes, trail=1))
            dib = jnp.asarray(_diag_broadcast(dg[1], axes, trail=1))
            out = jnp.stack([drb * re - dib * im, dib * re + drb * im])
            return out.reshape(2, 1 << m, state.shape[-1])
    d = 1 << k
    b = block.reshape(
        ((-1,) if variant_axis else ()) + (2,) + (2,) * k + (2,) + (2,) * k
    )
    b = _block_perm(b, k, axes, jnp)
    qs = sorted(axes)
    bsub, ssub, osub = _gate_subscripts(k)
    if variant_axis:
        bsub = "c" + bsub
    C = state.shape[-1]
    st = state.reshape(_bit_shape(qs, m, C))
    out = jnp.einsum(f"{bsub},{ssub}->{osub}", b, st)
    return out.reshape(2, 1 << m, C)


def make_lane_sim(virt: VirtualCircuit, frag_name: str,
                  fuse_qubits: int = 3):
    """Build ``sim_chunk(slot_mats) -> [2^width, C]`` for one fragment.

    ``slot_mats``: per-slot ``(pre[C,2,2,2,2], m4[C,2,4,2,4],
    post[C,2,2,2,2])`` gathered variant tables (the streamed path's
    device-side gather output).  Returns exactly
    ``jax.vmap(sim_one)(mats).T`` for the same gathered matrices.
    """
    from .variant_engine import label_strides, make_sim_fn

    sim_one, _, positions, flat_count = make_sim_fn(
        virt, frag_name, build_matrices=False, fuse_qubits=fuse_qubits
    )
    run_plan = sim_one.run_plan
    m0 = sim_one.prefix_width
    prefix = np.asarray(sim_one.prefix_state)  # [2, 2^m0]
    active_final = sim_one.active_final
    sources = sim_one.sources

    # host-computed output-bit permutation: after the keep-only pairwise
    # marginalisation the kept bits are little-endian over
    # reversed(active-kept); sim_one's row is little-endian over
    # ``sources`` (keep_axes order).  row_lane = marg[perm].
    act_sources = [q for q in sources if q in active_final]
    kept_desc = [
        q for q in reversed(sorted(active_final))
        if q in act_sources
    ]
    kk = len(act_sources)
    idx = np.arange(1 << kk)
    # output index i has bit j_out carrying act_sources[j_out]; the
    # marginalised source index holds that qubit at bit kept_desc.index(q)
    perm = np.zeros(1 << kk, np.int64)
    for j_out, q in enumerate(act_sources):
        j_in = kept_desc.index(q)
        perm += ((idx >> np.int64(j_out)) & 1) << np.int64(j_in)

    def sim_chunk(slot_mats):
        leaves = [m for t in slot_mats for m in t]
        C = leaves[0].shape[0] if leaves else 1
        state = jnp.broadcast_to(
            jnp.asarray(prefix)[:, :, None], (2, 1 << m0, C)
        )
        m = m0
        for stp in run_plan:
            kind = stp[0]
            if kind == "ins":
                pos = stp[1]
                r = state.reshape(2, 1 << pos, 1 << (m - pos), C)
                state = jnp.stack(
                    [r, jnp.zeros_like(r)], axis=2
                ).reshape(2, 1 << (m + 1), C)
                m += 1
            elif kind == "u":
                state = apply_lane(state, stp[1], stp[2], m, False)
            elif kind == "pauli":
                continue  # exact path
            else:
                pre, m4, post = slot_mats[stp[1]]
                blk = (
                    pre if kind == "slot_pre"
                    else m4 if kind == "slot_meas" else post
                )
                state = apply_lane(state, blk, stp[2], m, True)
        p = jnp.sum(state * state, axis=0)  # [2^m, C]
        # pairwise marginalisation over non-kept qubits, trailing C intact
        kept = sorted(active_final)
        keep_q = set(act_sources)
        cur = m
        for pos in reversed(range(len(kept))):
            if kept[pos] in keep_q:
                continue
            p = p.reshape(1 << pos, 2, -1, C).sum(axis=1)
            p = p.reshape(1 << (cur - 1), C)
            kept.pop(pos)
            cur -= 1
        row = p.reshape(1 << kk, C)[jnp.asarray(perm)]
        # splice deterministic |0> bits of never-touched source qubits
        for j, q in enumerate(sources):
            if q not in active_final:
                r = row.reshape(-1, 1 << j, C)
                row = jnp.stack([r, jnp.zeros_like(r)], axis=1).reshape(
                    -1, C
                )
        return row

    return sim_chunk, positions, flat_count
