"""Sparse dict-algebra knit — the reference's knitting algorithm, 1:1.

The TPU pipeline knits with dense tensor contractions (ops/knit.py); this
module reproduces the reference's host-side algorithm on the sparse
:class:`QuasiDistr` (qvm/virtual_circuit.py:50-68 + quasi_distr.py:45-60):
per global label, XOR-merge the fragments' variant distributions, then
reduce vgate-by-vgate in reverse order, splitting on the vgate's clbit
and summing with the signed knit coefficients.  It exists for API parity
and as an independent differential oracle for the tensor path.
"""
from __future__ import annotations

import numpy as np

from .quasi_distr import QuasiDistr
from .virtual_circuit import VirtualCircuit


def _fragment_sparse_rows(res, prune: float) -> list[QuasiDistr]:
    """FragmentResult rows -> sparse distrs keyed on *global* clbits."""
    rows = []
    values = np.asarray(res.values)
    for v in range(values.shape[0]):
        pairs = {}
        row = values[v]
        for i in np.nonzero(np.abs(row) > prune)[0]:
            key = 0
            for j, p in enumerate(res.bit_positions):
                if (int(i) >> j) & 1:
                    key |= 1 << p
            pairs[key] = float(row[i])
        rows.append(QuasiDistr.from_pairs(pairs, prune=0.0))
    return rows


def sparse_knit(
    virt: VirtualCircuit, results: list, prune: float = 0.0
) -> QuasiDistr:
    """Knit fragment results with the reference's sparse algorithm.

    ``results``: FragmentResults from the variant engine (exact rows or
    shot-sampled).  Returns the quasi-distribution over the original
    clbits, keys little-endian over global clbit positions.
    """
    specs = [vg.spec for vg in virt.vgates]
    num_g = len(specs)
    # global label order: all-vgate cartesian product, last fastest
    gstride: dict[int, int] = {}
    total = 1
    for g in reversed(range(num_g)):
        gstride[g] = total
        total *= specs[g].num_instantiations

    frag_rows = []
    frag_meta = []
    for res in results:
        frag_rows.append(_fragment_sparse_rows(res, prune))
        prog = virt.programs[res.name]
        strides: dict[int, int] = {}
        acc = 1
        for g in reversed(prog.touching):
            strides[g] = acc
            acc *= specs[g].num_instantiations
        frag_meta.append((list(prog.touching), strides))

    # merge across fragments per global label (quasi_distr.py:55-60)
    merged: list[QuasiDistr] = []
    for label in range(total):
        distr: QuasiDistr | None = None
        for rows, (touching, strides) in zip(frag_rows, frag_meta):
            local = 0
            for g in touching:
                digit = (
                    label // gstride[g]
                ) % specs[g].num_instantiations
                local += digit * strides[g]
            distr = rows[local] if distr is None else distr.merge(rows[local])
        merged.append(distr if distr is not None else QuasiDistr.from_pairs({}))

    # reverse per-vgate signed reduction (virtual_circuit.py:50-68)
    for g in reversed(range(num_g)):
        spec = specs[g]
        clbit = virt.num_clbits + g
        n = spec.num_instantiations
        reduced: list[QuasiDistr] = []
        for start in range(0, len(merged), n):
            acc: QuasiDistr | None = None
            for v in range(n):
                zeros, ones = merged[start + v].split(clbit)
                c0, c1 = spec.coef[v]
                term = zeros * float(c0) + ones * float(c1)
                acc = term if acc is None else acc + term
            reduced.append(acc)
        merged = reduced

    assert len(merged) == 1
    return merged[0]
