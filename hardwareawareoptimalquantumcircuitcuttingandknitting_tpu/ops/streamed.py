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

The chunk axis is also the natural ``dp`` sharding axis on a mesh (shard
the scan's xs, ``psum`` the carry — see parallel/).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..virt.virtual_circuit import VirtualCircuit
from .bits import permute_bits_flat
from .knit import fold_weights, nearest_probability_distribution
from .statevector import Distribution
from .variant_engine import _slot_matrices, make_sim_fn




def make_streamed_knit(
    virt: VirtualCircuit, chunk: int = 512, keep_clbits=None
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
    """
    specs = [vg.spec for vg in virt.vgates]
    num_g = len(specs)
    gstride: dict[int, int] = {}
    total = 1
    for g in reversed(range(num_g)):
        gstride[g] = total
        total *= specs[g].num_instantiations
    n_chunks = max(1, math.ceil(total / chunk))
    padded = n_chunks * chunk
    n_inst = {g: specs[g].num_instantiations for g in range(num_g)}

    labels = np.arange(padded)
    valid = (labels < total).astype(np.float32)

    frag_names = [r.name for r in virt.fragments]
    sim_ones = {}
    xs_slots = []      # per fragment: list of (pre, m4, post) [n_chunks, C, ...]
    xs_ws = []         # per fragment: list of w_sel [n_chunks, C, 2]
    fold_plans = []    # per fragment: list of (bit_offset | None)
    data_positions = []

    def _chunked(a: np.ndarray) -> np.ndarray:
        return np.ascontiguousarray(
            a.reshape((n_chunks, chunk) + a.shape[1:])
        )

    for name in frag_names:
        prog = virt.programs[name]
        sim_one, _local_mats, positions, _local_count = make_sim_fn(
            virt, name
        )
        sim_ones[name] = sim_one
        # global-label slot matrices: same gather as the local ones but with
        # the all-vgate stride table, so every label picks its variant
        mats = _slot_matrices(prog, specs, padded, gstride, n_inst)
        xs_slots.append([tuple(_chunked(m) for m in t) for t in mats])

        ws = []
        plan = []
        pos = list(positions)
        k = len(pos)
        frag_weights = fold_weights(virt, name)
        for ti, g in enumerate(prog.touching):
            w = frag_weights[ti]
            v_idx = (labels // gstride[g]) % n_inst[g]
            ws.append(_chunked(w[v_idx].astype(np.float32)))
            cg = virt.num_clbits + g
            if cg in pos:
                j = pos.index(cg)
                plan.append(("w", j, k))
                pos.pop(j)
                k -= 1
            else:
                plan.append(("w", None, k))
        if keep_clbits is not None:
            for p in [p for p in pos if p not in keep_clbits]:
                j = pos.index(p)
                plan.append(("drop", j, k))
                pos.pop(j)
                k -= 1
        xs_ws.append(ws)
        fold_plans.append(plan)
        data_positions.append(pos)

    shape = tuple(1 << len(p) for p in data_positions)
    # 'z' is the chunk label — fragment labels must not collide with it
    letters = "abdefghijklm"
    assert len(frag_names) <= len(letters)
    expr = (
        ",".join(f"z{letters[i]}" for i in range(len(frag_names)))
        + "->" + letters[: len(frag_names)]
    )

    def step_fn(xs):
        slots_xs, ws_xs, valid_xs = xs

        def body(carry, x):
            slot_chunks, w_chunks, valid_chunk = x
            es = []
            for fi, name in enumerate(frag_names):
                sim_one = sim_ones[name]
                mats = slot_chunks[fi]
                if mats:
                    rows = jax.vmap(sim_one)(mats)
                else:
                    row = sim_one([])
                    rows = jnp.broadcast_to(row, (chunk, row.shape[0]))
                w_iter = iter(w_chunks[fi])
                for kind, j, k in fold_plans[fi]:
                    if kind == "drop":
                        high, low = 1 << (k - 1 - j), 1 << j
                        rows = rows.reshape(chunk, high, 2, low).sum(axis=2)
                        rows = rows.reshape(chunk, -1)
                        continue
                    w_sel = next(w_iter)
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

        carry0 = jnp.zeros(shape, dtype=jnp.float32)
        out, _ = jax.lax.scan(body, carry0, (slots_xs, ws_xs, valid_xs))
        # interleave fragment bit groups to global ascending clbit order
        src_bits: list[int] = []
        for pos_list in reversed(data_positions):
            src_bits.extend(pos_list)
        return permute_bits_flat(out.reshape(-1), src_bits, sorted(src_bits))

    xs = (xs_slots, xs_ws, _chunked(valid))
    meta = {
        "positions": sorted(
            p for pos_list in data_positions for p in pos_list
        ),
        "global_labels": total,
        "n_chunks": n_chunks,
        "chunk": chunk,
    }
    return step_fn, xs, meta


# Per-buffer budget for the scan body's [chunk, 2, 2^n] intermediates.
# XLA keeps ~10 gate intermediates live at once; measured on v5e
# (15.75 GB usable): chunk=1024 at 2^18 sim qubits (2 GB/buffer) OOMs at
# 20 GB, chunk=512 (1 GB/buffer) runs fine — 512 MB/buffer leaves 2x
# headroom.
_CHUNK_BYTES_BUDGET = 512 * 1024 * 1024


def auto_chunk(virt: VirtualCircuit, requested: int) -> int:
    max_n = max(
        (p.num_sim_qubits for p in virt.programs.values()), default=1
    )
    per_variant = 2 * (1 << max_n) * 4
    cap = max(8, _CHUNK_BYTES_BUDGET // per_variant)
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    # never pad a small fan-out up to a huge chunk of masked-out labels
    return int(max(1, min(requested, cap, total)))


def run_virtual_circuit_streamed(
    virt: VirtualCircuit, chunk: int = 512, project: bool = False
) -> Distribution:
    """End-to-end streamed execution on the default device.  ``chunk`` is
    capped by :func:`auto_chunk` to bound device memory."""
    step_fn, xs, meta = make_streamed_knit(virt, auto_chunk(virt, chunk))
    values = np.asarray(jax.jit(step_fn)(xs))
    dist = Distribution(values, meta["positions"], virt.num_clbits)
    if project:
        dist = nearest_probability_distribution(dist)
    return dist
