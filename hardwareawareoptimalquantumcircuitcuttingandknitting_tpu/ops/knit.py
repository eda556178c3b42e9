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
from .statevector import Distribution
from .variant_engine import FragmentResult


def _fold_fragment(
    virt: VirtualCircuit, res: FragmentResult
) -> tuple[np.ndarray | jnp.ndarray, list[int]]:
    """Apply per-vgate coefficient weights; return E_f with shape
    [n_v1, ..., n_vm, 2^d] plus the data-bit positions (ascending clbit
    order of the remaining bits; bit axes flattened little-endian)."""
    touching = res.touching
    n_inst = [virt.vgates[g].num_instantiations for g in touching]
    k = len(res.bit_positions)
    t = jnp.asarray(res.values).reshape(tuple(n_inst) + (2,) * k)
    # bit axes are descending-position after reshape (LSB-first rows)
    bit_axis = {
        pos: len(n_inst) + (k - 1 - j)
        for j, pos in enumerate(res.bit_positions)
    }

    # which side of each touching vgate lives here?
    sides: dict[int, list[int]] = {g: [] for g in touching}
    for slot in virt.programs[res.name].slots:
        sides[slot.vgate_idx].append(slot.side)

    data_positions = [p for p in res.bit_positions if p < virt.num_clbits]

    for ti, g in enumerate(touching):
        spec = virt.vgates[g].spec
        my_sides = sides[g]
        both = len(my_sides) == 2
        # weight matrix W[v, b]
        w = np.ones((spec.num_instantiations, 2), dtype=np.float64)
        for v in range(spec.num_instantiations):
            if both or spec.owner_side[v] in my_sides:
                w[v] = spec.coef[v]
        cg = virt.num_clbits + g
        if cg in bit_axis:
            ax = bit_axis[cg]
            # contract bit axis with W sharing the variant axis ti
            t = jnp.einsum(
                t, list(range(t.ndim)),
                jnp.asarray(w, dtype=t.dtype), [ti, ax],
                [i for i in range(t.ndim) if i != ax],
            )
            # axes after ax shift down by one
            bit_axis = {
                p: (a - 1 if a > ax else a)
                for p, a in bit_axis.items()
                if p != cg
            }
        else:
            # clbit structurally zero here: scalar weight per variant
            shape = [1] * t.ndim
            shape[ti] = spec.num_instantiations
            t = t * jnp.asarray(w[:, 0], dtype=t.dtype).reshape(shape)

    # flatten remaining bit axes (they are the data bits, descending order)
    t = t.reshape(tuple(n_inst) + (-1,))
    return t, data_positions


def knit(
    virt: VirtualCircuit, results: list[FragmentResult]
) -> Distribution:
    """Contract all fragment results into the reconstructed distribution
    over the original clbits (host wrapper around ``knit_values``)."""
    values, positions = knit_values(virt, results)
    return Distribution(np.asarray(values), positions, virt.num_clbits)


def knit_values(
    virt: VirtualCircuit, results: list[FragmentResult]
):
    """Traceable knit: results' ``values`` may be jnp tracers.  Returns
    (flat values over written data clbits little-endian, positions)."""
    letters = list(string.ascii_letters)
    vgate_letter = {g: letters.pop() for g in range(len(virt.vgates))}

    operands = []
    subs = []
    out_sub = ""
    frag_positions: list[list[int]] = []
    for res in results:
        e, data_pos = _fold_fragment(virt, res)
        sub = "".join(vgate_letter[g] for g in res.touching)
        dl = letters.pop()
        sub += dl
        out_sub += dl
        operands.append(jnp.asarray(e))
        subs.append(sub)
        frag_positions.append(data_pos)

    expr = ",".join(subs) + "->" + out_sub
    merged = jnp.einsum(expr, *operands)

    # merged axes: one per fragment, each flattening that fragment's data
    # bits in descending clbit order.  Expand to individual bits, reorder to
    # global descending clbit order, flatten little-endian.
    bit_list: list[int] = []  # per final axis (after expand), clbit position
    shape = []
    for pos_list in frag_positions:
        shape.extend([2] * len(pos_list))
        bit_list.extend(sorted(pos_list, reverse=True))
    merged = merged.reshape(tuple(shape) if shape else (1,))
    if bit_list:
        order = sorted(range(len(bit_list)), key=lambda i: -bit_list[i])
        merged = jnp.transpose(merged, order)
    return merged.reshape(-1), sorted(bit_list)


def nearest_probability_distribution(dist: Distribution) -> Distribution:
    """Project a quasi-distribution onto the probability simplex, matching
    the reference's Smolin-style projection (quasi_distr.py:28-43)."""
    vals = np.asarray(dist.values, dtype=np.float64)
    order = np.argsort(vals, kind="stable")
    out = np.zeros_like(vals)
    beta = 0.0
    num = len(vals)
    for i in order:
        temp = vals[i] + beta / num
        if temp < 0:
            beta += vals[i]
            num -= 1
        else:
            out[i] = vals[i] + beta / num
    return Distribution(
        out.astype(np.float32), dist.bit_positions, dist.num_clbits
    )
