"""Bit-permutation primitives for flat probability tensors.

Flat distributions index outcomes little-endian: bit ``j`` (LSB) of the
last-axis index carries the label ``bits[j]``.  Reordering bit labels is a
permutation of the 2^m entries.  Done naively — reshape to ``(2,)*m`` and
``transpose`` — the rank grows with the qubit count (rank 24+ for the
uncut oracle), which TPU XLA compiles pathologically slowly.  Here:

  * runs of bits that move together are compressed, so block-structured
    permutations (e.g. concatenating two fragments' contiguous clbit
    ranges) become rank-2/3 transposes;
  * genuinely scattered permutations (e.g. full bit reversal) fall back
    to a 1-D gather whose index vector is computed *on device* with shift
    arithmetic — no host-side index upload, bounded-rank program.
"""
from __future__ import annotations

import jax.numpy as jnp

_MAX_TRANSPOSE_RANK = 8


def _compress_runs(order: list[int]) -> tuple[list[tuple[int, int]], bool]:
    """Group a permutation into maximal runs of consecutive source axes.
    Returns (groups in target order as (start, length), is_identity)."""
    groups: list[tuple[int, int]] = []
    start, length = order[0], 1
    for idx in order[1:]:
        if idx == start + length:
            length += 1
        else:
            groups.append((start, length))
            start, length = idx, 1
    groups.append((start, length))
    return groups, groups == [(0, len(order))]


def permute_bits_flat(x, src_bits: list[int], dst_bits: list[int]):
    """Reorder the last axis of ``x`` (length 2^m) from little-endian bit
    labels ``src_bits`` to ``dst_bits`` (same label set).  Leading axes are
    untouched."""
    m = len(src_bits)
    assert sorted(src_bits) == sorted(dst_bits)
    if m == 0 or src_bits == dst_bits:
        return x

    # axis t (of a (2,)*m C-order split) is bit m-1-t
    src_axes = list(reversed(src_bits))
    dst_axes = list(reversed(dst_bits))
    pos_in_src = {b: t for t, b in enumerate(src_axes)}
    order = [pos_in_src[b] for b in dst_axes]
    groups, identity = _compress_runs(order)
    if identity:
        return x

    lead = x.shape[:-1]
    if len(groups) <= _MAX_TRANSPOSE_RANK:
        src_sorted = sorted(range(len(groups)), key=lambda g: groups[g][0])
        src_order_pos = {g: p for p, g in enumerate(src_sorted)}
        nlead = len(lead)
        shape = lead + tuple(1 << groups[g][1] for g in src_sorted)
        perm = tuple(range(nlead)) + tuple(
            nlead + src_order_pos[g] for g in range(len(groups))
        )
        y = jnp.transpose(x.reshape(shape), perm)
        return y.reshape(lead + (1 << m,))

    # gather fallback: dst index d reads src index built by bit arithmetic
    src_lsb = {b: j for j, b in enumerate(src_bits)}
    d = jnp.arange(1 << m, dtype=jnp.int32)
    s = jnp.zeros_like(d)
    for j, b in enumerate(dst_bits):
        s = s | (((d >> j) & 1) << src_lsb[b])
    return jnp.take(x, s, axis=-1)


def permute_bits_flat_np(x, src_bits: list[int], dst_bits: list[int]):
    """Host (numpy) twin of :func:`permute_bits_flat` — for fetch-side
    reordering of large distributions whose 2^m buffers must never enter
    a tunneled-TPU program (compile time scales with buffer size)."""
    import numpy as np

    m = len(src_bits)
    assert sorted(src_bits) == sorted(dst_bits)
    if m == 0 or src_bits == dst_bits:
        return x
    src_lsb = {b: j for j, b in enumerate(src_bits)}
    d = np.arange(1 << m, dtype=np.int64)
    s = np.zeros_like(d)
    for j, b in enumerate(dst_bits):
        s |= ((d >> j) & 1) << src_lsb[b]
    return np.asarray(x)[..., s]
