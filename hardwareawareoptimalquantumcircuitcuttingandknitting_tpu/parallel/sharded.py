"""Sharded cut-circuit execution: the multi-chip path.

One jitted step computes every fragment's full QPD variant fan-out and the
knit contraction, with GSPMD shardings over a 2D mesh:

  * slot-matrix inputs (leading variant axis) sharded over ``dp`` — each
    device simulates a slice of the 6^g * 8^w instantiations;
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
from ..ops.variant_engine import FragmentResult, make_sim_fn
from ..virt.virtual_circuit import VirtualCircuit


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    reps = np.repeat(x[-1:], n - x.shape[0], axis=0)
    return np.concatenate([x, reps], axis=0)


def make_sharded_step(virt: VirtualCircuit, mesh: Mesh):
    """Build (step_fn, example_args).  ``step_fn(*flat_slot_mats)`` returns
    the knitted quasi-distribution values; jit it with the returned
    shardings for multi-chip execution:

        jitted = jax.jit(step_fn, in_shardings=shardings)
    """
    dp = mesh.shape["dp"]
    frag_meta = []
    flat_args: list[np.ndarray] = []
    shardings: list[NamedSharding] = []
    for reg in virt.fragments:
        sim_one, slot_mats, positions, flat_count = make_sim_fn(
            virt, reg.name
        )
        padded = -(-flat_count // dp) * dp
        arrs = []
        for mats in slot_mats:
            arrs.append(tuple(_pad_to(np.asarray(m), padded) for m in mats))
        frag_meta.append(
            (reg.name, sim_one, positions, flat_count, padded, len(arrs))
        )
        for mats in arrs:
            for m in mats:
                flat_args.append(m)
                shardings.append(
                    NamedSharding(mesh, P("dp", *([None] * (m.ndim - 1))))
                )

    def step_fn(*args):
        idx = 0
        results = []
        for name, sim_one, positions, flat_count, padded, n_slots in frag_meta:
            slot_mats = []
            for _ in range(n_slots):
                slot_mats.append((args[idx], args[idx + 1], args[idx + 2]))
                idx += 3
            if n_slots == 0:
                row = sim_one([])
                rows = jnp.broadcast_to(
                    row, (max(1, flat_count), row.shape[0])
                )
            else:
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
