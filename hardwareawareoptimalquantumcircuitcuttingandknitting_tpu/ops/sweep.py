"""Parameter-sweep serving: one compiled cut-sim-knit step, many bindings.

VQE/QAOA-style workloads re-run the same circuit *structure* with new
gate parameters.  Everywhere else in the engine the gate matrices are
trace-time constants (ideal for a single run: XLA folds them), so a new
parameter set would recompile.  Here the whole pipeline is traced once
with gate blocks, QPD slot matrices AND knit coefficients as runtime
arguments; ``bind`` converts any same-structure cut circuit into an
argument pytree.  One compile, arbitrarily many parameter sets — the
serving loop the reference (which rebuilds and re-simulates everything
per run) has no analog of.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..virt.virtual_circuit import VirtualCircuit
from .fusion import fused_stream
from .knit import fold_weights, knit_values
from .statevector import apply_matrix, marginalize_flat, to_real_block
from .variant_engine import FragmentResult, _slot_matrices, label_strides


def _fused_stream(prog):
    """Shared fused op stream (ops/fusion.fused_stream) with the matrices
    converted to real blocks.  max_qubits=3 like the single-chip exact
    engine (variant_engine.make_sim_fn): the sweep runner's apply_matrix
    handles k-qubit blocks and every merged block saves an HBM pass in
    the steady serving loop."""
    skeleton, mats = fused_stream(prog.ops, max_qubits=3)
    return skeleton, [to_real_block(m) for m in mats]


def make_parameter_sweep(virt: VirtualCircuit, keep_clbits=None):
    """Build (runner, bind) for the cut plan embodied by ``virt``.

    ``bind(other_virt)`` -> argument pytree for any VirtualCircuit with
    the same structure (same cut plan applied to a re-parameterised
    circuit; structural mismatch raises).  ``runner(args)`` -> flat
    knitted quasi-distribution values; jit it once and reuse.
    """
    frag_names = [r.name for r in virt.fragments]
    template = {}
    for name in frag_names:
        prog = virt.programs[name]
        skeleton, _blocks = _fused_stream(prog)
        positions = sorted(prog.clbit_sources)
        sources = [prog.clbit_sources[c] for c in positions]
        specs = [vg.spec for vg in virt.vgates]
        _, _, flat_count = label_strides(specs, prog.touching)
        template[name] = (
            skeleton, positions, sources, prog.num_sim_qubits, flat_count,
        )

    def runner(args):
        slot_mats, gate_blocks, weights = args
        results = []
        for fi, name in enumerate(frag_names):
            skeleton, positions, sources, n, flat_count = template[name]

            def sim_one(mats, blocks=gate_blocks[fi], skel=skeleton,
                        srcs=sources, nq=n):
                state = jnp.zeros((2, 1 << nq), dtype=jnp.float32)
                state = state.at[0, 0].set(1.0)
                bi = 0
                for op in skel:
                    if op[0] == "u":
                        state = apply_matrix(state, blocks[bi], op[1], nq)
                        bi += 1
                    else:
                        kind, sid, axes = op
                        pre, m4, post = mats[sid]
                        mat = {"slot_pre": pre, "slot_meas": m4,
                               "slot_post": post}[kind]
                        state = apply_matrix(state, mat, axes, nq)
                p = jnp.sum(state * state, axis=0)
                return marginalize_flat(p, nq, srcs)

            mats = slot_mats[fi]
            if mats:
                values = jax.vmap(sim_one)(mats)
            else:
                row = sim_one([])
                values = jnp.broadcast_to(row, (flat_count, row.shape[0]))
            results.append(FragmentResult(
                name, values, positions,
                list(virt.programs[name].touching),
            ))
        values, _pos = knit_values(
            virt, results, keep_clbits, weights=weights
        )
        return values

    def bind(other: VirtualCircuit):
        if [r.name for r in other.fragments] != frag_names:
            raise ValueError("fragment structure mismatch")
        slot_mats, gate_blocks, weights = [], [], []
        for name in frag_names:
            prog = other.programs[name]
            skeleton, positions, _srcs, n, flat_count = template[name]
            skel2, blocks2 = _fused_stream(prog)
            if skel2 != skeleton:
                raise ValueError(
                    f"fragment {name}: op structure differs from template"
                )
            specs = [vg.spec for vg in other.vgates]
            strides, n_inst, acc = label_strides(specs, prog.touching)
            slot_mats.append(
                _slot_matrices(prog, specs, acc, strides, n_inst)
            )
            gate_blocks.append([jnp.asarray(b) for b in blocks2])
            weights.append([
                jnp.asarray(w, dtype=jnp.float32)
                for w in fold_weights(other, name)
            ])
        return (slot_mats, gate_blocks, weights)

    return runner, bind
