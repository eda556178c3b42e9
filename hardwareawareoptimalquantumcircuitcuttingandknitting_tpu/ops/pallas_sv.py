"""Pallas TPU kernel: fused whole-fragment statevector simulation.

The hot op of the framework (the Aer-replacement compute path, SURVEY §2.4).
Design:

* the QPD variant axis lives on the 128 *lanes*; the 2^n amplitudes live on
  sublanes/rows — so every gate, on any qubit, is a strided row-mixing
  elementwise op (VPU at full width), never a lane shuffle;
* the whole gate sequence executes in VMEM scratch: one HBM read of the tiny
  per-variant parameters and one HBM write of the marginalised probability
  block per tile — no per-gate HBM roundtrips (unlike the unrolled XLA path,
  which materialises the state after every gate);
* mid-circuit QPD measurements use *projector branches* instead of deferred-
  measurement ancillas: each measuring vgate contributes one branch bit to
  the lane axis (lane = variant x branch-code), and the measuring endpoint
  applies the per-lane projector (1-b, b) — so the in-kernel state never
  grows beyond the fragment's data qubits;
* per-variant endpoint behaviour (pre/post 2x2 unitaries, projector masks)
  enters as per-lane coefficient vectors, so one kernel serves the entire
  6^g * 8^w fan-out; grid = lane tiles of 128.

Falls back to the XLA engine for fragments with mid-circuit *data*
measurements / classical feedback, or > MAX_KERNEL_QUBITS qubits.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..virt.virtual_circuit import VirtualCircuit
from .variant_engine import FragmentResult, label_strides

MAX_KERNEL_QUBITS = 13  # 2 * 4B * 2^n * 128 lanes must fit VMEM
LANES = 128


@dataclass
class _SlotInfo:
    vgate_idx: int
    side: int
    qubit: int
    branch_bit: int | None  # index into the fragment's branch-code bits


def _plan(virt: VirtualCircuit, frag_name: str):
    """Static plan: op list over data qubits only, slots with branch bits."""
    prog = virt.programs[frag_name]
    n = prog.num_data_qubits
    if n > MAX_KERNEL_QUBITS:
        return None

    # branch bits: one per touching vgate whose clbit is written here
    meas_vgates = sorted(
        c - virt.num_clbits
        for c in prog.clbit_sources
        if c >= virt.num_clbits
    )
    branch_of = {g: j for j, g in enumerate(meas_vgates)}

    ops = []  # ("u", complex mat, qubits) | ("slot", _SlotInfo)
    terminal_sources: dict[int, int] = {}
    for kind, payload in prog.source:
        if kind == "slot":
            g, side, lq = payload
            ops.append(
                ("slot", _SlotInfo(g, side, lq, branch_of.get(g)))
            )
            continue
        ins = payload
        if ins.name == "measure":
            terminal_sources[ins.clbits[0]] = ins.qubits[0]
            continue
        if ins.name in ("reset",) or ins.condition is not None:
            return None  # fall back to the XLA engine
        if ins.name == "barrier":
            continue
        if len(ins.qubits) > 2:
            return None  # decompose() upstream handles 3q gates
        mat = (
            np.asarray(ins.op) if ins.name == "unitary" else ins.matrix()
        )
        ops.append(("u", mat, tuple(ins.qubits)))

    # verify data measures are terminal (no later ops on the qubit)
    touched_after: set[int] = set()
    for kind, payload in reversed(prog.source):
        if kind == "slot":
            touched_after.add(payload[2])
        elif payload.name == "measure":
            if payload.qubits[0] in touched_after:
                return None
            touched_after.add(payload.qubits[0])
        elif payload.name != "barrier":
            touched_after.update(payload.qubits)

    data_positions = sorted(terminal_sources)
    kept_qubits = sorted({terminal_sources[c] for c in data_positions})
    if len(kept_qubits) != len(data_positions):
        return None  # two clbits from one qubit — engine fallback
    return (
        prog, n, meas_vgates, ops, terminal_sources, data_positions,
        kept_qubits,
    )


def _slot_lane_params(virt, prog, meas_vgates, slots, flat_lanes):
    """Per-lane (variant x branch-code) coefficient arrays for every slot:
    pre[8], mask[2], post[8] -> concatenated [lanes, 18] float32."""
    strides, n_inst, v_count = label_strides(virt.vgates, prog.touching)
    m = len(meas_vgates)
    total = v_count << m

    lane = np.arange(total)
    code = lane & ((1 << m) - 1)
    variant = lane >> m

    out = []
    # first measuring slot per vgate handles the zero-branch masking when no
    # endpoint measures under the current variant
    first_slot_of_g: dict[int, int] = {}
    for s_i, info in enumerate(slots):
        if info.branch_bit is not None and info.vgate_idx not in first_slot_of_g:
            first_slot_of_g[info.vgate_idx] = s_i

    for s_i, info in enumerate(slots):
        g = info.vgate_idx
        spec = virt.vgates[g].spec
        v_g = (variant // strides[g]) % n_inst[g]
        pres = np.stack([p[info.side].pre for p in spec.endpoints])[v_g]
        posts = np.stack([p[info.side].post for p in spec.endpoints])[v_g]
        meas = np.array(
            [p[info.side].measure for p in spec.endpoints], dtype=bool
        )[v_g]
        # does ANY endpoint of g in this fragment measure at this variant?
        any_meas = np.zeros(total, dtype=bool)
        for other in slots:
            if other.vgate_idx != g:
                continue
            o_meas = np.array(
                [p[other.side].measure for p in spec.endpoints], dtype=bool
            )[v_g]
            any_meas |= o_meas

        if info.branch_bit is None:
            m0 = np.ones(total)
            m1 = np.ones(total)
        else:
            b = (code >> info.branch_bit) & 1
            m0 = np.ones(total)
            m1 = np.ones(total)
            # measuring here: projector (1-b, b)
            m0 = np.where(meas, 1.0 - b, m0)
            m1 = np.where(meas, b.astype(float), m1)
            # nobody measures g at this variant: designated slot kills b=1
            if first_slot_of_g.get(g) == s_i:
                dead = (~any_meas) & (b == 1)
                m0 = np.where(dead, 0.0, m0)
                m1 = np.where(dead, 0.0, m1)

        def c8(mats):
            return np.stack(
                [
                    mats[:, 0, 0].real, mats[:, 0, 0].imag,
                    mats[:, 0, 1].real, mats[:, 0, 1].imag,
                    mats[:, 1, 0].real, mats[:, 1, 0].imag,
                    mats[:, 1, 1].real, mats[:, 1, 1].imag,
                ],
                axis=1,
            )

        params = np.concatenate(
            [c8(pres), np.stack([m0, m1], axis=1), c8(posts)], axis=1
        ).astype(np.float32)
        out.append(params)

    if not out:
        arr = np.zeros((total, 0), dtype=np.float32)
    else:
        arr = np.concatenate(out, axis=1)  # [total, 18 * n_slots]
    pad = -(total) % flat_lanes
    if pad:
        arr = np.concatenate(
            [arr, np.zeros((pad, arr.shape[1]), np.float32)]
        )
    return arr, v_count, total


def _apply_1q_rows(re, im, q, n, c):
    """c = (u00r,u00i,u01r,u01i,u10r,u10i,u11r,u11i), scalars or [128]."""
    shape = (1 << q, 2, 1 << (n - 1 - q), LANES)
    re = re.reshape(shape)
    im = im.reshape(shape)
    a_re, b_re = re[:, 0], re[:, 1]
    a_im, b_im = im[:, 0], im[:, 1]
    u00r, u00i, u01r, u01i, u10r, u10i, u11r, u11i = c
    na_re = u00r * a_re - u00i * a_im + u01r * b_re - u01i * b_im
    na_im = u00r * a_im + u00i * a_re + u01r * b_im + u01i * b_re
    nb_re = u10r * a_re - u10i * a_im + u11r * b_re - u11i * b_im
    nb_im = u10r * a_im + u10i * a_re + u11r * b_im + u11i * b_re
    re = jnp.stack([na_re, nb_re], axis=1).reshape(1 << n, LANES)
    im = jnp.stack([na_im, nb_im], axis=1).reshape(1 << n, LANES)
    return re, im


def _apply_mask_rows(re, im, q, n, m0, m1):
    shape = (1 << q, 2, 1 << (n - 1 - q), LANES)
    re = re.reshape(shape)
    im = im.reshape(shape)
    re = jnp.stack([re[:, 0] * m0, re[:, 1] * m1], axis=1)
    im = jnp.stack([im[:, 0] * m0, im[:, 1] * m1], axis=1)
    return re.reshape(1 << n, LANES), im.reshape(1 << n, LANES)


def _apply_2q_rows(re, im, qa, qb, n, u):
    """Fixed 2q gate with complex numpy matrix u on row qubits qa < qb."""
    assert qa < qb
    shape = (
        1 << qa, 2, 1 << (qb - qa - 1), 2, 1 << (n - 1 - qb), LANES
    )
    re = re.reshape(shape)
    im = im.reshape(shape)
    parts = {}
    for i in range(2):
        for j in range(2):
            parts[(i, j)] = (re[:, i, :, j], im[:, i, :, j])
    new_re = [[None, None], [None, None]]
    new_im = [[None, None], [None, None]]
    for i in range(2):
        for j in range(2):
            acc_re = None
            acc_im = None
            for k in range(2):
                for l in range(2):
                    w = complex(u[i * 2 + j, k * 2 + l])
                    if w == 0:
                        continue
                    pr, pi = parts[(k, l)]
                    t_re = w.real * pr - w.imag * pi
                    t_im = w.real * pi + w.imag * pr
                    acc_re = t_re if acc_re is None else acc_re + t_re
                    acc_im = t_im if acc_im is None else acc_im + t_im
            if acc_re is None:
                acc_re = jnp.zeros_like(parts[(0, 0)][0])
                acc_im = jnp.zeros_like(parts[(0, 0)][1])
            new_re[i][j] = acc_re
            new_im[i][j] = acc_im
    re = jnp.stack(
        [jnp.stack([new_re[i][0], new_re[i][1]], axis=2) for i in range(2)],
        axis=1,
    )
    im = jnp.stack(
        [jnp.stack([new_im[i][0], new_im[i][1]], axis=2) for i in range(2)],
        axis=1,
    )
    return re.reshape(1 << n, LANES), im.reshape(1 << n, LANES)


def build_fragment_kernel(virt: VirtualCircuit, frag_name: str):
    """Returns (fn, params, meta) or None if this fragment needs the XLA
    fallback.  ``fn(params)`` -> probs [2^k, padded_lanes] on device."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plan = _plan(virt, frag_name)
    if plan is None:
        return None
    (prog, n_data, meas_vgates, ops, terminal_sources, data_positions,
     kept_qubits) = plan
    n = max(n_data, 1)

    slots = [e[1] for e in ops if e[0] == "slot"]
    params, v_count, total = _slot_lane_params(
        virt, prog, meas_vgates, slots, LANES
    )
    n_tiles = params.shape[0] // LANES
    k = len(kept_qubits)
    width = max(1, 1 << k)
    p_cols = max(params.shape[1], 1)
    if params.shape[1] == 0:
        params = np.zeros((n_tiles * LANES, 1), np.float32)

    drop_qubits = [q for q in range(n) if q not in kept_qubits]

    def kernel(param_ref, out_ref, re_ref, im_ref):
        re_ref[...] = jnp.zeros((1 << n, LANES), jnp.float32)
        im_ref[...] = jnp.zeros((1 << n, LANES), jnp.float32)
        re_ref[0, :] = jnp.ones((LANES,), jnp.float32)
        re = re_ref[...]
        im = im_ref[...]

        col = 0
        for entry in ops:
            if entry[0] == "u":
                _, mat, qubits = entry
                if len(qubits) == 1:
                    u = np.asarray(mat, dtype=complex)
                    c = (
                        float(u[0, 0].real), float(u[0, 0].imag),
                        float(u[0, 1].real), float(u[0, 1].imag),
                        float(u[1, 0].real), float(u[1, 0].imag),
                        float(u[1, 1].real), float(u[1, 1].imag),
                    )
                    re, im = _apply_1q_rows(re, im, qubits[0], n, c)
                else:
                    qa, qb = qubits
                    u = np.asarray(mat, dtype=complex)
                    if qa > qb:
                        # reorder gate-local bits so qa < qb
                        perm = [0, 2, 1, 3]
                        u = u[np.ix_(perm, perm)]
                        qa, qb = qb, qa
                    re, im = _apply_2q_rows(re, im, qa, qb, n, u)
            else:
                info = entry[1]
                base = col
                pre = tuple(param_ref[:, base + j] for j in range(8))
                m0 = param_ref[:, base + 8]
                m1 = param_ref[:, base + 9]
                post = tuple(param_ref[:, base + 10 + j] for j in range(8))
                col += 18
                q = info.qubit
                re, im = _apply_1q_rows(re, im, q, n, pre)
                re, im = _apply_mask_rows(re, im, q, n, m0, m1)
                re, im = _apply_1q_rows(re, im, q, n, post)

        probs = re * re + im * im
        # marginalise dropped qubits, highest qubit first (keeps strides valid)
        cur_n = n
        kept = list(range(n))
        for q in sorted(drop_qubits, reverse=True):
            pos = kept.index(q)
            shape = (
                1 << pos, 2, 1 << (cur_n - 1 - pos), LANES
            )
            probs = probs.reshape(shape)
            probs = probs[:, 0] + probs[:, 1]
            cur_n -= 1
            kept.pop(pos)
            probs = probs.reshape(1 << cur_n, LANES)
        out_ref[...] = probs.reshape(width, LANES)

    def fn(par, interpret=False):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (width, n_tiles * LANES), jnp.float32
            ),
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (LANES, p_cols), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (width, LANES), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((1 << n, LANES), jnp.float32),
                pltpu.VMEM((1 << n, LANES), jnp.float32),
            ],
            # the default scoped-VMEM budget is 16 MB; a 13-qubit fragment
            # needs 2 x 2^13 x 128 x 4B of state scratch plus gate
            # temporaries.  v5e has 128 MB of physical VMEM — allow most
            # of it.
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(par)

    meta = {
        "v_count": v_count,
        "total": total,
        "meas_vgates": meas_vgates,
        "data_positions": data_positions,
        "kept_qubits": kept_qubits,
        "terminal_sources": terminal_sources,
        "width": width,
    }
    return fn, params, meta


def run_fragment_pallas(
    virt: VirtualCircuit, frag_name: str, interpret: bool = False
) -> FragmentResult | None:
    """Execute a fragment's full variant fan-out via the Pallas kernel.
    Returns None when the fragment requires the XLA fallback."""
    built = build_fragment_kernel(virt, frag_name)
    if built is None:
        return None
    fn, params, meta = built
    prog = virt.programs[frag_name]

    out = np.asarray(fn(jnp.asarray(params), interpret=interpret))
    out = out[:, : meta["total"]]  # [2^k, V*2^m]

    # rows: bit order = kept qubits ascending with FIRST axis most
    # significant; convert to little-endian over data_positions.
    k = len(meta["kept_qubits"])
    m = len(meta["meas_vgates"])
    total, v_count = meta["total"], meta["v_count"]
    arr = out.T.reshape(v_count, 1 << m, *((2,) * k))
    if k:
        # axis j (after the first two) corresponds to kept_qubits[j] —
        # map to clbit order: data_positions sorted ascending, source
        # qubit of data_positions[i] = terminal_sources[...]
        src = [meta["terminal_sources"][c] for c in meta["data_positions"]]
        # current axes ordered by ascending qubit, MSB-first; desired flat
        # little-endian: bit i (LSB) = data_positions[i] -> qubit src[i]
        ascending = sorted(src)
        perm = [ascending.index(q) for q in reversed(src)]
        arr = np.transpose(
            arr, (0, 1) + tuple(2 + p for p in perm)
        )
    arr = arr.reshape(v_count, 1 << m, max(1, 1 << k))
    # branch code bit j = meas_vgates[j] (ascending): LSB = smallest vgate
    # clbit; vgate clbits sit above all data clbits, so flat index =
    # code * 2^k + data
    arr = arr.reshape(v_count, -1) if k or m else arr.reshape(v_count, 1)
    positions = list(meta["data_positions"]) + [
        virt.num_clbits + g for g in meta["meas_vgates"]
    ]
    return FragmentResult(
        frag_name, arr.astype(np.float32), positions, list(prog.touching)
    )
