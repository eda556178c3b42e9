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

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..virt.virtual_circuit import VirtualCircuit
from .fusion import fused_stream
from .knit import expectation_z_multi, fold_weights, knit_values
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


def make_parameter_sweep(virt: VirtualCircuit, keep_clbits=None,
                         z_sets=None, variant_sharding=None):
    """Build (runner, bind) for the cut plan embodied by ``virt``.

    ``bind(other_virt)`` -> argument pytree for any VirtualCircuit with
    the same structure (same cut plan applied to a re-parameterised
    circuit; structural mismatch raises).  ``runner(args)`` -> flat
    knitted quasi-distribution values; jit it once and reuse.

    ``z_sets`` (list of clbit sets): observable mode — the runner returns
    the ``[len(z_sets)]`` vector of <prod Z> expectations via the
    per-fragment parity contraction (ops/knit.expectation_z_multi)
    instead of knitting a distribution, so nothing of size
    2^num_clbits ever materialises (the wide-circuit serving shape).

    ``variant_sharding`` (a ``NamedSharding`` with spec ``("dp", None)``):
    multi-chip mode — each fragment's vmapped per-variant probability
    rows are constrained to it, so GSPMD splits the QPD fan-out over the
    ``dp`` mesh axis and lowers the variant-axis contraction to an
    all-reduce over ICI.
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
                if variant_sharding is not None:
                    values = jax.lax.with_sharding_constraint(
                        values, variant_sharding
                    )
            else:
                row = sim_one([])
                values = jnp.broadcast_to(row, (flat_count, row.shape[0]))
            results.append(FragmentResult(
                name, values, positions,
                list(virt.programs[name].touching),
            ))
        if z_sets is not None:
            return expectation_z_multi(virt, results, z_sets, weights)
        values, _pos = knit_values(
            virt, results, keep_clbits, weights=weights
        )
        return values

    runner.template = template  # skeletons, for the differentiable binder

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


# ---------------------------------------------------------------------------
# Differentiable sweep: jax.grad through the cut-sim-knit pipeline
# ---------------------------------------------------------------------------
#
# Gates built with circuit.ParamRef parameters keep a reference to a
# position in an external theta vector.  make_differentiable_sweep
# rebuilds exactly those matrices from theta INSIDE the traced program
# (re-running the gate fuser with jax.numpy — the fusion structure
# depends only on op axes, so the skeleton matches the template) and
# reuses make_parameter_sweep's runner.  The result: gradients of any
# function of the knitted distribution w.r.t. the circuit parameters,
# with the cut plan, QPD slot tables and knit weights as constants —
# variational (VQE/QAOA-style) optimisation on circuits too large for
# one device.  No analog exists in the reference (its ansatz generators
# qcg/hw_efficient_ansatz.py, uccsd_ansatz.py are sampling-only).

_C64 = None  # lazy jnp constants cache


def _fsim_basis():
    import numpy as np

    e00 = np.zeros((4, 4), np.complex64); e00[0, 0] = 1
    mid_c = np.zeros((4, 4), np.complex64); mid_c[1, 1] = mid_c[2, 2] = 1
    mid_s = np.zeros((4, 4), np.complex64); mid_s[1, 2] = mid_s[2, 1] = 1
    e33 = np.zeros((4, 4), np.complex64); e33[3, 3] = 1
    return e00, mid_c, mid_s, e33


def _mat_theta(name: str, ps):
    """Traceable complex64 matrix for a parameterised gate, matching
    circuit/gates.py's conventions (first listed qubit = gate-local MSB)."""
    from ..circuit import gates as G

    c64 = jnp.complex64

    def e(x):
        return jnp.exp(1j * jnp.asarray(x).astype(c64))

    def diag(entries):
        return jnp.diag(jnp.stack(
            [jnp.asarray(v).astype(c64) for v in entries]
        ))

    one = jnp.asarray(1.0, c64)
    if name in ("rx", "ry"):
        half = ps[0] * 0.5
        c = jnp.cos(half).astype(c64)
        s = jnp.sin(half).astype(c64)
        pauli = G.X if name == "rx" else G.Y
        return c * jnp.asarray(G.I2) - 1j * s * jnp.asarray(pauli)
    if name == "rz":
        half = ps[0] * 0.5
        return diag([e(-half), e(half)])
    if name in ("p", "u1"):
        return diag([one, e(ps[0])])
    if name in ("u3", "u", "u2"):
        if name == "u2":
            th, ph, lam = jnp.float32(math.pi / 2), ps[0], ps[1]
        else:
            th, ph, lam = ps
        c = jnp.cos(th * 0.5).astype(c64)
        s = jnp.sin(th * 0.5).astype(c64)
        row0 = jnp.stack([c, -e(lam) * s])
        row1 = jnp.stack([e(ph) * s, e(ph) * e(lam) * c])
        return jnp.stack([row0, row1])
    if name == "rzz":
        half = ps[0] * 0.5
        return diag([e(-half), e(half), e(half), e(-half)])
    if name in ("cp", "cu1"):
        return diag([one, one, one, e(ps[0])])
    if name == "crz":
        half = ps[0] * 0.5
        return diag([one, one, e(-half), e(half)])
    if name == "fsim":
        th, ph = ps
        c = jnp.cos(th).astype(c64)
        s = jnp.sin(th).astype(c64)
        e00, mid_c, mid_s, e33 = _fsim_basis()
        return (
            jnp.asarray(e00) + c * jnp.asarray(mid_c)
            - 1j * s * jnp.asarray(mid_s) + e(-ph) * jnp.asarray(e33)
        )
    raise NotImplementedError(
        f"no traceable matrix for parameterised gate {name!r}"
    )


def _real_block_traceable(u):
    """Traceable twin of ops.statevector.to_real_block."""
    ur = jnp.real(u).astype(jnp.float32)
    ui = jnp.imag(u).astype(jnp.float32)
    return jnp.stack(
        [jnp.stack([ur, -ui], axis=1), jnp.stack([ui, ur], axis=1)], axis=0
    )


def _check_no_param_cut_gates(virt: VirtualCircuit):
    from ..circuit.circuit import ParamRef

    for g, vg in enumerate(virt.vgates):
        if any(isinstance(p, ParamRef) for p in vg.params):
            raise NotImplementedError(
                f"cut gate {g} ({vg.base_name}) carries a ParamRef: its "
                "QPD slot tables and knit coefficients would depend on "
                "theta; keep ParamRefs off cut gates"
            )


def _count_params(virt: VirtualCircuit, frag_names) -> int:
    from ..circuit.circuit import ParamRef

    n_params = 0
    for name in frag_names:
        prog = virt.programs[name]
        for ins in prog.op_instrs.values():
            for p in ins.params:
                if isinstance(p, ParamRef):
                    n_params = max(n_params, p.index + 1)
    return n_params


def _theta_gate_blocks(prog, theta, template_skel, frag_name):
    """Traceable fused gate blocks for one fragment: every op carrying a
    ParamRef is rebuilt from ``theta`` (via :func:`_mat_theta`), the
    fuser re-runs with jax.numpy, and the skeleton is checked against
    the trace-time template (fusion structure depends only on op axes,
    so divergence means a bug, not data)."""
    from ..circuit.circuit import ParamRef

    ops_theta = []
    for i, op in enumerate(prog.ops):
        if op[0] in ("u", "u_aux"):
            ins = prog.op_instrs.get(i)
            if ins is not None and any(
                isinstance(p, ParamRef) for p in ins.params
            ):
                ps = [
                    theta[p.index] * p.scale + p.shift
                    if isinstance(p, ParamRef)
                    else jnp.float32(p)
                    for p in ins.params
                ]
                ops_theta.append((op[0], _mat_theta(ins.name, ps), op[2]))
                continue
        ops_theta.append(op)
    skel, mats = fused_stream(ops_theta, max_qubits=3, xp=jnp)
    if skel != template_skel:  # defensive: axes-only
        raise RuntimeError(
            f"fragment {frag_name}: traced fusion skeleton diverged"
        )
    return [_real_block_traceable(m) for m in mats]


def make_differentiable_sweep(virt: VirtualCircuit, keep_clbits=None,
                              z_sets=None, variant_sharding=None):
    """Build ``runner_theta(theta) -> flat knitted values`` for a cut
    circuit whose gates carry :class:`~..circuit.circuit.ParamRef`
    parameters.  ``runner_theta`` is jit-able and differentiable w.r.t.
    theta (shape ``[n_params]``); returns ``(runner_theta, n_params)``.

    ``z_sets``: observable mode — runner_theta returns the
    ``[len(z_sets)]`` vector of <prod Z> expectations via the fragment
    parity contraction; no 2^num_clbits array exists anywhere in the
    program (differentiable observables at any circuit width).

    The cut plan, QPD slot tables and knit weights are trace-time
    constants: only the parameterised gate matrices (and every fused
    block containing one) are rebuilt from theta.  Cut gates must not
    carry ParamRefs (differentiating through a parameterised gate's own
    QPD tables is not supported) — cut cx/cz/cy around parameterised
    1q/2q layers is the supported variational shape.
    """
    _check_no_param_cut_gates(virt)

    runner, bind = make_parameter_sweep(
        virt, keep_clbits, z_sets, variant_sharding
    )
    slot_mats_c, _gate_blocks_c, weights_c = bind(virt)
    frag_names = [r.name for r in virt.fragments]
    n_params = _count_params(virt, frag_names)

    def runner_theta(theta):
        theta = jnp.asarray(theta, jnp.float32)
        gate_blocks = [
            _theta_gate_blocks(
                virt.programs[name], theta, runner.template[name][0], name
            )
            for name in frag_names
        ]
        return runner((slot_mats_c, gate_blocks, weights_c))

    return runner_theta, n_params


def make_sampled_sweep(virt: VirtualCircuit, labels, mass, z_sets=None,
                       variant_sharding=None):
    """Differentiable STOCHASTIC sweep: ``runner_theta(theta)`` evaluates
    the Monte-Carlo QPD estimator (ops/qpd_sampling) over a FIXED label
    sample instead of the full per-fragment variant grid — the
    variational twin of :func:`~.qpd_sampling.sampled_knit` /
    :func:`~.qpd_sampling.sampled_expectation_z`.

    ``labels [L, G]`` / ``mass [L]`` come from
    :func:`~.qpd_sampling.sample_label_counts` (``mass = counts / N``);
    with the FULL grid and exact mass the runner reproduces the exact
    sweep (tested identity).  Because the labels are fixed across theta,
    successive evaluations share one compiled program AND use common
    random numbers — energy differences and finite-difference /
    ``jax.grad`` gradients are unbiased with the sampling noise
    differenced out (E[grad estimator] = grad E = exact gradient).

    Cost per fragment is ``L x 2^n_f`` instead of ``flat_count_f x
    2^n_f``: the regime where a single fragment touches many cuts
    (flat_count blows up exponentially) stays serveable at a chosen
    sample budget.  ``z_sets`` -> [num_sets] expectations via the
    parity matmul (nothing of size 2^num_clbits exists); otherwise the
    flat knitted estimate over ``runner_theta.bit_positions``.
    ``variant_sharding`` constrains each fragment's per-label rows
    (label axis over ``dp``) exactly like the exact sweep's variant
    fan-out."""
    from .bits import permute_bits_flat
    from .qpd_sampling import (
        _fold_rows_per_label,
        _z_sign_matrix,
        sampling_overhead,
    )
    from .variant_engine import _slot_tables

    _check_no_param_cut_gates(virt)
    frag_names = [r.name for r in virt.fragments]
    n_params = _count_params(virt, frag_names)
    lab_np = np.asarray(labels, np.int32)
    lab = jnp.asarray(lab_np)
    gamma_total = sampling_overhead(virt)["gamma_total"]
    w = jnp.asarray(
        np.asarray(mass, np.float64) * gamma_total, jnp.float32
    )
    if z_sets is not None:
        z_sets = [set(s) for s in z_sets]

    specs = [vg.spec for vg in virt.vgates]
    templates = {}
    slot_mats = {}
    for name in frag_names:
        prog = virt.programs[name]
        skeleton, _blocks = _fused_stream(prog)
        positions = sorted(prog.clbit_sources)
        sources = [prog.clbit_sources[c] for c in positions]
        templates[name] = (
            skeleton, positions, sources, prog.num_sim_qubits,
        )
        tables = _slot_tables(prog, specs, fused=False)
        slot_mats[name] = [
            tuple(jnp.asarray(t)[lab_np[:, slot.vgate_idx]] for t in tabs)
            for slot, tabs in zip(prog.slots, tables)
        ]

    def runner_theta(theta):
        theta = jnp.asarray(theta, jnp.float32)
        frag_rows = []
        frag_positions = []
        for name in frag_names:
            skeleton, positions, sources, nq = templates[name]
            blocks = _theta_gate_blocks(
                virt.programs[name], theta, skeleton, name
            )

            def sim_one(mats, blocks=blocks, skel=skeleton,
                        srcs=sources, n=nq):
                state = jnp.zeros((2, 1 << n), dtype=jnp.float32)
                state = state.at[0, 0].set(1.0)
                bi = 0
                for op in skel:
                    if op[0] == "u":
                        state = apply_matrix(state, blocks[bi], op[1], n)
                        bi += 1
                    else:
                        kind, sid, axes = op
                        pre, m4, post = mats[sid]
                        mat = {"slot_pre": pre, "slot_meas": m4,
                               "slot_post": post}[kind]
                        state = apply_matrix(state, mat, axes, n)
                p = jnp.sum(state * state, axis=0)
                return marginalize_flat(p, n, srcs)

            mats = slot_mats[name]
            if mats:
                rows = jax.vmap(sim_one)(mats)
            else:
                row = sim_one([])
                rows = jnp.broadcast_to(
                    row, (lab_np.shape[0], row.shape[0])
                )
            if variant_sharding is not None:
                rows = jax.lax.with_sharding_constraint(
                    rows, variant_sharding
                )
            rows, pos = _fold_rows_per_label(
                virt, name, rows, lab, positions
            )
            frag_rows.append(rows)
            frag_positions.append(pos)
        if z_sets is not None:
            prodmat = None
            for rows, pos in zip(frag_rows, frag_positions):
                sc = rows @ _z_sign_matrix(pos, z_sets, rows.dtype)
                prodmat = sc if prodmat is None else prodmat * sc
            return w @ prodmat
        # distribution mode: weighted label-axis einsum, mirroring
        # ops/qpd_sampling._estimate's combine
        src_bits = []
        for pos in reversed(frag_positions):
            src_bits.extend(pos)
        dst_bits = sorted(src_bits)
        operands = [w, [0]]
        for i, rows in enumerate(frag_rows):
            operands += [rows, [0, 1 + i]]
        merged = jnp.einsum(
            *operands, list(range(1, 1 + len(frag_rows)))
        ).reshape(-1)
        return permute_bits_flat(merged, src_bits, dst_bits)

    # static fold bookkeeping: the data clbits each fragment keeps
    runner_theta.bit_positions = sorted(
        p
        for name in frag_names
        for p in templates[name][1]
        if p < virt.num_clbits
    )
    return runner_theta, n_params


def pauli_z_diagonal(bit_positions, z_clbits) -> np.ndarray:
    """[2^m] vector of (-1)^(parity of the bits in ``z_clbits``) over the
    flat little-endian index (bit j carries ``bit_positions[j]``) — dot it
    with a runner's output values for <prod Z> expectation objectives."""
    m = len(bit_positions)
    idx = np.arange(1 << m)
    parity = np.zeros(1 << m, np.int64)
    for j, c in enumerate(bit_positions):
        if c in z_clbits:
            parity ^= (idx >> j) & 1
    return (1.0 - 2.0 * parity).astype(np.float32)
