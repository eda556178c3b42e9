"""Sharded cut-circuit execution: the multi-chip path.

One jitted step computes every fragment's full QPD variant fan-out and the
knit contraction, with GSPMD shardings over a 2D mesh:

  * per-label variant-index inputs (leading variant axis, int32) sharded
    over ``dp`` — each device simulates a slice of the 6^g * 8^w
    instantiations, gathering its slot matrices on device from constant
    per-instantiation tables (see ops/streamed.py);
  * per-variant probability rows constrained to ``("dp", "tp")`` — the knit
    einsum over the variant axis then lowers to sharded matmuls with an
    all-reduce over ``dp`` riding ICI (the TPU analog of the reference's
    Pool(8) merge+reduce, qvm/run.py:64-67).

This is the "training step" equivalent of the framework: cut once, then
execute this step per shot-batch / parameter update.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.knit import knit_values
from ..ops.statevector import Distribution
from ..ops.variant_engine import (
    FragmentResult,
    _slot_tables,
    label_strides,
    make_sim_fn,
    variant_index_table,
)
from ..virt.virtual_circuit import VirtualCircuit


def make_sharded_step(virt: VirtualCircuit, mesh: Mesh, dtype=None):
    """Build (step_fn, example_args).  ``step_fn(*frag_vidx)`` — one
    ``[padded, n_touching]`` int32 variant-index array per fragment —
    returns the knitted quasi-distribution values; jit it with the
    returned shardings for multi-chip execution:

        jitted = jax.jit(step_fn, in_shardings=shardings)

    ``dtype``: ``jnp.bfloat16`` is the quantized serving mode — the
    per-variant statevectors at half the HBM bytes (probability rows
    and the knit stay f32; same contract as the streamed engine,
    tests/test_bf16_serving.py).
    """
    dp = mesh.shape["dp"]
    specs = [vg.spec for vg in virt.vgates]
    frag_meta = []
    flat_args: list[np.ndarray] = []
    shardings: list[NamedSharding] = []
    for reg in virt.fragments:
        prog = virt.programs[reg.name]
        sim_one, _, positions, flat_count = make_sim_fn(
            virt, reg.name, build_matrices=False, fused_slots=True,
            dtype=dtype,
        )
        strides, n_inst, _fc = label_strides(specs, prog.touching)
        padded = -(-flat_count // dp) * dp
        touch_col = {g: i for i, g in enumerate(prog.touching)}
        vidx = variant_index_table(
            prog.touching, strides, n_inst, padded, clamp_to=flat_count
        )
        tables = [
            tuple(jnp.asarray(m, dtype=dtype) for m in t)
            for t in _slot_tables(prog, specs, fused=True)
        ]
        slot_cols = [touch_col[s.vgate_idx] for s in prog.slots]
        frag_meta.append(
            (reg.name, sim_one, positions, flat_count, tables, slot_cols)
        )
        flat_args.append(vidx)
        shardings.append(NamedSharding(mesh, P("dp", None)))

    def step_fn(*args):
        results = []
        for (name, sim_one, positions, flat_count, tables, slot_cols), \
                vidx in zip(frag_meta, args):
            if not slot_cols:
                row = sim_one([])
                rows = jnp.broadcast_to(
                    row, (max(1, flat_count), row.shape[0])
                )
            else:
                slot_mats = [
                    tuple(t[vidx[:, c]] for t in tabs)
                    for c, tabs in zip(slot_cols, tables)
                ]
                rows = jax.vmap(sim_one)(slot_mats)
                tp = mesh.shape["tp"]
                col = "tp" if (tp > 1 and rows.shape[1] % tp == 0) else None
                rows = jax.lax.with_sharding_constraint(
                    rows, NamedSharding(mesh, P("dp", col))
                )
                rows = rows[:flat_count]
            results.append(
                FragmentResult(name, rows, positions, list(
                    virt.programs[name].touching
                ))
            )
        values, _positions = knit_values(virt, results)
        return values

    # positions are static — recompute once for callers
    positions = _knit_positions(virt)
    return step_fn, flat_args, shardings, positions


def _knit_positions(virt: VirtualCircuit) -> list[int]:
    pos: set[int] = set()
    for reg in virt.fragments:
        for c in virt.programs[reg.name].clbit_sources:
            if c < virt.num_clbits:
                pos.add(c)
    return sorted(pos)


def run_virtual_circuit_sharded(
    virt: VirtualCircuit, mesh: Mesh
) -> Distribution:
    """Convenience wrapper: build, jit with shardings, execute, wrap."""
    step_fn, args, shardings, positions = make_sharded_step(virt, mesh)
    jitted = jax.jit(step_fn, in_shardings=shardings)
    device_args = [
        jax.device_put(a, s) for a, s in zip(args, shardings)
    ]
    values = np.asarray(jitted(*device_args))
    return Distribution(values, positions, virt.num_clbits)
