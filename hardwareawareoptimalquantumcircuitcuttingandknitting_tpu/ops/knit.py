"""Knitting: reconstruct the uncut circuit's distribution by tensor
contraction.

Replaces the reference's Pool(8) dict algebra — XOR-keyed cartesian merge +
per-vgate signed reduction (qvm/virtual_circuit.py:50-68,216-228,
qvm/quasi_distr.py:45-60) — with one einsum over the variant axes:

    knitted[bits] = sum_{v_1..v_k} prod_f E_f[v_{T_f}, bits_f]

where E_f folds the vgate knit coefficients ``coef[v, clbit]`` into the
fragment that measured the vgate's clbit.  On a device mesh the contraction's
variant axis is the natural ``psum`` axis (see parallel/).
"""
from __future__ import annotations

import string

import jax
import jax.numpy as jnp
import numpy as np

from ..virt.virtual_circuit import VirtualCircuit
from .bits import permute_bits_flat
from .statevector import Distribution
from .variant_engine import FragmentResult


def fold_weights(virt: VirtualCircuit, frag_name: str) -> list[np.ndarray]:
    """Per-touching-vgate knit weight matrices W[v, b] this fragment
    applies (owner-side logic).  Exposed so callers can pass them as
    runtime arguments (parameter sweeps re-bind RZZ/CP coefficients
    without recompiling the knit)."""
    prog = virt.programs[frag_name]
    sides: dict[int, list[int]] = {g: [] for g in prog.touching}
    for slot in prog.slots:
        sides[slot.vgate_idx].append(slot.side)
    out = []
    for g in prog.touching:
        spec = virt.vgates[g].spec
        my_sides = sides[g]
        both = len(my_sides) == 2
        w = np.ones((spec.num_instantiations, 2), dtype=np.float64)
        for v in range(spec.num_instantiations):
            if both or spec.owner_side[v] in my_sides:
                w[v] = spec.coef[v]
        out.append(w)
    return out


def _fold_fragment(
    virt: VirtualCircuit, res: FragmentResult, keep_clbits=None,
    weights=None,
) -> tuple[np.ndarray | jnp.ndarray, list[int]]:
    """Apply per-vgate coefficient weights; return E_f with shape
    [n_v1, ..., n_vm, 2^d] plus the data-bit positions (remaining bits,
    flattened little-endian in ascending clbit order).

    Each vgate's clbit is contracted by splitting only *that* bit out of
    the flat outcome axis, keeping the program rank at len(n_inst)+3
    regardless of the fragment's clbit count — a full (2,)*k bit-split
    would push TPU XLA into very-high-rank transposes.

    ``keep_clbits`` (set or None): if given, data clbits NOT in the set
    are summed out *before* the cross-fragment contraction.  This is the
    marginal knit: because fragments write disjoint clbits, marginalising
    each fragment first commutes with the knit product, so the
    reconstructed marginal is exact while the full 2^num_clbits
    distribution never materialises (the only way to knit 30+ qubit
    circuits).

    NOTE: ops/qpd_sampling._fold_rows_per_label is this fold's per-label
    twin (Monte-Carlo estimator) — semantic changes here (owner rule,
    zero-clbit branch, bit-split order) must be mirrored there.
    """
    touching = res.touching
    n_inst = [virt.vgates[g].num_instantiations for g in touching]
    nv = len(n_inst)
    positions = list(res.bit_positions)  # ascending; LSB-first in the rows
    k = len(positions)
    t = jnp.asarray(res.values).reshape(tuple(n_inst) + (1 << k,))

    if weights is None:
        weights = fold_weights(virt, res.name)

    for ti, g in enumerate(touching):
        spec = virt.vgates[g].spec
        w = weights[ti]
        cg = virt.num_clbits + g
        if cg in positions:
            j = positions.index(cg)          # LSB offset of this clbit
            high, low = 1 << (k - 1 - j), 1 << j
            t = t.reshape(tuple(n_inst) + (high, 2, low))
            # contract the bit axis with W sharing the variant axis ti
            t = jnp.einsum(
                t, list(range(nv)) + [nv, nv + 1, nv + 2],
                jnp.asarray(w, dtype=t.dtype), [ti, nv + 1],
                list(range(nv)) + [nv, nv + 2],
            )
            positions.pop(j)
            k -= 1
            t = t.reshape(tuple(n_inst) + (1 << k,))
        else:
            # clbit structurally zero here: scalar weight per variant
            shape = [1] * (nv + 1)
            shape[ti] = spec.num_instantiations
            t = t * jnp.asarray(w[:, 0], dtype=t.dtype).reshape(shape)

    if keep_clbits is not None:
        for p in [p for p in positions if p not in keep_clbits]:
            j = positions.index(p)
            high, low = 1 << (k - 1 - j), 1 << j
            t = t.reshape(tuple(n_inst) + (high, 2, low)).sum(axis=nv + 1)
            positions.pop(j)
            k -= 1
            t = t.reshape(tuple(n_inst) + (1 << k,))

    return t, positions


def knit(
    virt: VirtualCircuit,
    results: list[FragmentResult],
    keep_clbits=None,
) -> Distribution:
    """Contract all fragment results into the reconstructed distribution
    over the original clbits (host wrapper around ``knit_values``).
    ``keep_clbits`` selects a marginal — see ``_fold_fragment``."""
    values, positions = knit_values(virt, results, keep_clbits)
    return Distribution(np.asarray(values), positions, virt.num_clbits)


def knit_values(
    virt: VirtualCircuit,
    results: list[FragmentResult],
    keep_clbits=None,
    weights=None,
):
    """Traceable knit: results' ``values`` may be jnp tracers.  Returns
    (flat values over written data clbits little-endian, positions).

    ``weights``: optional per-fragment list of per-touching-vgate weight
    matrices (tracers allowed) replacing the trace-time constants from
    :func:`fold_weights` — parameter sweeps pass these as arguments."""
    expr, operands, frag_positions = _knit_operands(
        virt, results, weights, keep_clbits
    )
    merged = jnp.einsum(expr, *operands).reshape(-1)

    # merged axes: one per fragment, each holding that fragment's data
    # bits little-endian; the LAST fragment axis occupies the LOW bits of
    # the C-order flat index.  Interleave to global ascending clbit order
    # with a rank-bounded bit permutation.
    src_bits: list[int] = []
    for pos_list in reversed(frag_positions):
        src_bits.extend(pos_list)
    dst_bits = sorted(src_bits)
    merged = permute_bits_flat(merged, src_bits, dst_bits)
    return merged, dst_bits


def expectation_z(
    virt: VirtualCircuit,
    results: list[FragmentResult],
    z_clbits,
) -> float:
    """<prod_{c in z_clbits} Z_c> of the reconstructed distribution.

    The parity sign (-1)^{popcount(x & S)} factorises over the fragments'
    disjoint clbit sets, so each fragment contracts to ONE scalar per
    variant (bit c weighted (+1,-1) if c in S else summed (+1,+1)) and
    the observable is a contraction over the variant axes alone — no
    distribution of any size materialises.  This is the serving path for
    observable estimation on circuits of any width.
    """
    return float(expectation_z_multi(virt, results, [z_clbits])[0])


def expectation_z_multi(
    virt: VirtualCircuit,
    results: list[FragmentResult],
    z_sets,
    weights=None,
):
    """Traceable batch of <prod Z> observables: returns a jnp vector of
    ``len(z_sets)`` expectations (see :func:`expectation_z` for why the
    parity contraction factorises over fragments).  The fragment fold runs
    ONCE; each z-set then reduces every data bit with its own (+1,+1) /
    (+1,-1) weights — per-set scalars per variant — and the cross-fragment
    contraction carries a shared set axis.  ``results`` values may be jnp
    tracers and ``weights`` (per-fragment, parameter-sweep style) may
    replace the trace-time constants, so this is the wide-circuit
    observable path for the differentiable sweep: a Hamiltonian group's
    expectations without materialising any 2^num_clbits distribution.
    """
    z_sets = [set(s) for s in z_sets]
    # every Z support bit must actually be WRITTEN by a measure — an
    # unmeasured clbit would silently contract as (+1,+1) and report 1.0
    # (a circuit from the zoo without terminal measures is the common
    # trap: add `circ.measure(q, c)` for every observable qubit)
    written = {
        p for res in results for p in res.bit_positions
        if p < virt.num_clbits
    }
    for z in z_sets:
        missing = z - written
        if missing:  # ValueError, not assert: must survive ``python -O``
            raise ValueError(
                f"z_clbits {sorted(missing)} are never measured "
                f"(written data clbits: {sorted(written)})"
            )
    letters = list(string.ascii_letters)
    vgate_letter = {g: letters.pop() for g in range(len(virt.vgates))}
    set_letter = letters.pop()

    operands = []
    subs = []
    for fi, res in enumerate(results):
        e, data_pos = _fold_fragment(
            virt, res, None, None if weights is None else weights[fi]
        )
        nv = e.ndim - 1
        per_set = []
        for z in z_sets:
            k = len(data_pos)
            pos = list(data_pos)
            t = e
            for p in list(pos):
                j = pos.index(p)
                high, low = 1 << (k - 1 - j), 1 << j
                t = t.reshape(t.shape[:nv] + (high, 2, low))
                sign = jnp.asarray(
                    [1.0, -1.0] if p in z else [1.0, 1.0], dtype=t.dtype
                )
                t = jnp.einsum(
                    t, list(range(nv)) + [nv, nv + 1, nv + 2],
                    sign, [nv + 1],
                    list(range(nv)) + [nv, nv + 2],
                )
                pos.remove(p)
                k -= 1
                t = t.reshape(t.shape[:nv] + (1 << k,))
            per_set.append(t.reshape(t.shape[:nv]))
        operands.append(jnp.stack(per_set))
        subs.append(
            set_letter + "".join(vgate_letter[g] for g in res.touching)
        )

    expr = ",".join(subs) + "->" + set_letter
    return jnp.einsum(expr, *operands)


def smolin_project(vals: np.ndarray) -> np.ndarray:
    """Vectorised Smolin projection onto the probability simplex,
    numerically identical to the reference's ascending scan
    (quasi_distr.py:28-43) without the O(2^n) Python loop.

    Key fact: in the reference loop the discarded entries are exactly a
    *prefix* of the ascending value order (once one entry passes, beta and
    num freeze and every later — larger — entry passes too).  So the cut
    index k* is the first position where ``v[k] + cumsum(v)[:k]/(n-k) >= 0``
    and the output is ``v + beta/(n-k*)`` on the kept set, 0 on the
    discarded set — all computable with one partial selection.  Only the
    negative tail can be discarded (plus a small safety margin of tiny
    positives), so the sort runs over O(#negatives) entries, not 2^n:
    ghz-24's 16.7M-entry projection drops from ~30 s to <50 ms.

    Tie caveat: when several entries share the exact boundary value,
    ``argpartition`` may zero a different (equal-valued) subset than a
    full stable ascending sort would, so the per-index output can differ
    from the reference's when exact ties straddle the cut.  The choice is
    arbitrary in the reference too (its ordering depends on dict
    insertion order); both follow the same published scan, which is not
    tie-deterministic.
    """
    vals = np.asarray(vals, dtype=np.float64)
    n = vals.size
    neg = int((vals < 0).sum())
    if neg == 0:
        return vals.copy()
    for cap in (min(n, 2 * neg + 1024), n):
        if cap == n:
            idx = np.arange(n)
        else:
            idx = np.argpartition(vals, cap - 1)[:cap]
        order = np.argsort(vals[idx], kind="stable")
        sv = vals[idx][order]
        csum = np.concatenate(([0.0], np.cumsum(sv[:-1])))
        ok = sv + csum / (n - np.arange(sv.size)) >= 0
        if ok.any():
            k = int(np.argmax(ok))
            out = vals + csum[k] / (n - k)
            out[idx[order[:k]]] = 0.0
            return out
        if cap == n:
            break
    return np.zeros_like(vals)  # everything discarded (degenerate input)


def nearest_probability_distribution(dist: Distribution) -> Distribution:
    """Project a quasi-distribution onto the probability simplex, matching
    the reference's Smolin-style projection (quasi_distr.py:28-43)."""
    out = smolin_project(np.asarray(dist.values, dtype=np.float64))
    return Distribution(
        out.astype(np.float32), dist.bit_positions, dist.num_clbits
    )


def prune_distribution(dist: Distribution, accuracy: float = 1e-5) -> Distribution:
    """Reference-compatible support pruning: zero every entry with
    ``|value| <= accuracy``.

    The reference's QuasiDistr drops such entries at EVERY construction
    (quasi_distr.py:3 ``ACCURACY = 1e-5`` and the ``__init__`` filter at
    quasi_distr.py:8-10), which concentrates a finite-shot knit's support
    on its high-mass keys — at sup-20 scale this is the difference
    between the raw two-sample overlap floor (~1e-6) and the reference's
    recorded 2.07e-3 cut fidelity.  The exact dense path never needs
    this; it exists for shot-sampled parity experiments."""
    vals = np.asarray(dist.values)
    out = np.where(np.abs(vals) <= accuracy, 0.0, vals)
    return Distribution(
        out.astype(vals.dtype), dist.bit_positions, dist.num_clbits
    )


def _knit_operands(virt, results, weights=None, keep_clbits=None):
    """Shared setup of :func:`knit_values`'s einsum: returns
    (expr, es, frag_positions)."""
    letters = list(string.ascii_letters)
    vgate_letter = {g: letters.pop() for g in range(len(virt.vgates))}
    operands, subs, out_sub = [], [], ""
    frag_positions: list[list[int]] = []
    for fi, res in enumerate(results):
        e, data_pos = _fold_fragment(
            virt, res, keep_clbits,
            None if weights is None else weights[fi],
        )
        sub = "".join(vgate_letter[g] for g in res.touching)
        dl = letters.pop()
        subs.append(sub + dl)
        out_sub += dl
        operands.append(jnp.asarray(e))
        frag_positions.append(data_pos)
    return ",".join(subs) + "->" + out_sub, operands, frag_positions


def _knit_block_cols(frag_positions, max_elems: int) -> int:
    """Column-block width over the LAST fragment's data axis such that one
    output block holds <= max_elems floats.

    Only the last fragment's axis is blocked: if the OTHER fragments'
    joint width alone exceeds ``max_elems`` the bound cannot be met
    (bc floors at 1) — that is logged loudly rather than silently
    compiling an over-budget buffer on the tunneled TPU."""
    other = 1
    for pos in frag_positions[:-1]:
        other <<= len(pos)
    last = 1 << len(frag_positions[-1])
    bc = max(1, max_elems // other)
    while last % bc:
        bc >>= 1
    bc = max(1, bc)
    if other * bc > max_elems:
        from ..utils.logger import get_logger

        get_logger(__name__).warning(
            f"blocked knit cannot meet the {max_elems}-float buffer "
            f"budget: non-last fragments span 2^{other.bit_length() - 1} "
            "alone — expect a slow compile on the tunneled backend "
            "(consider keep_clbits/marginal knit)"
        )
    return bc


def knit_scalars_blocked(virt, results, max_elems: int = 1 << 20):
    """Traceable (total, negativity) of the knitted distribution WITHOUT
    ever materialising it: the last fragment's data axis is processed in
    column blocks inside a ``lax.scan``, so the largest live buffer is
    ``max_elems`` floats instead of 2^num_clbits.  On the tunneled TPU
    backend, where compile time scales with the largest program buffer
    (>15 min at 2^24 floats), this is the difference between a ~1 s and a
    ~16 min first call for a ghz-24-class knit."""
    expr, es, frag_positions = _knit_operands(virt, results)
    bc = _knit_block_cols(frag_positions, max_elems)
    last = es[-1]
    nb = last.shape[-1] // bc
    blocks = jnp.moveaxis(
        last.reshape(last.shape[:-1] + (nb, bc)), -2, 0
    )

    def body(carry, blk):
        tot, neg = carry
        out = jnp.einsum(expr, *es[:-1], blk)
        return (tot + jnp.sum(out), neg + jnp.sum(jnp.minimum(out, 0.0))), None

    (total, neg), _ = jax.lax.scan(
        body, (jnp.float32(0.0), jnp.float32(0.0)), blocks
    )
    return total, neg


def make_blocked_knit(virt, results, max_elems: int = 1 << 20):
    """Build (block_fn, nb, bc, src_bits): ``block_fn(j)`` (jit once, call
    per block) returns column block ``j`` of the knit einsum — shape
    ``[other_size, bc]`` — with every device buffer <= ``max_elems``.

    Host assembly: concatenate the fetched blocks along the column axis,
    flatten C-order, then reorder with
    ``ops.bits.permute_bits_flat_np(flat, src_bits, sorted(src_bits))`` to
    get :func:`knit_values`'s output (fetch-side permutation — the 2^m
    buffer never enters a device program)."""
    expr, es, frag_positions = _knit_operands(virt, results)
    bc = _knit_block_cols(frag_positions, max_elems)
    last = es[-1]
    nb = last.shape[-1] // bc
    other = 1
    for pos in frag_positions[:-1]:
        other <<= len(pos)

    def block_fn(j):
        blk = jax.lax.dynamic_slice_in_dim(last, j * bc, bc, axis=-1)
        return jnp.einsum(expr, *es[:-1], blk).reshape(other, bc)

    src_bits: list[int] = []
    for pos_list in reversed(frag_positions):
        src_bits.extend(pos_list)
    return block_fn, nb, bc, src_bits
