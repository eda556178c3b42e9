"""Exact statevector simulation on TPU via JAX.

First-party replacement for qiskit-aer's role in the reference
(third_party/qvm/qvm/run.py:42, src/HwAwareCutter/Utilities.py:49).  Unlike
Aer's shot sampler, the default path computes *exact* outcome probabilities:
mid-circuit measurement is handled by the deferred-measurement principle
(a CX onto a fresh ancilla), ``reset`` by swapping with a fresh |0> ancilla,
and classically-conditioned X/Z by a CX/CZ from the bit's holder qubit.  The
final probability tensor is marginalised onto the written clbits, which
reproduces Aer's counts semantics exactly in expectation.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.circuit import Circuit
from ..circuit.gates import CX, CZ, SWAP, gate_matrix
from ..utils.jaxcache import enable_cache

enable_cache()

# ---------------------------------------------------------------------------
# Real-arithmetic representation.
#
# The axon TPU backend does not implement complex64 reliably, and real f32 is
# what the MXU/VPU natively consume, so the state is carried as a real tensor
# of shape [2] + [2]*n — axis 0 is the (re, im) component — and every k-qubit
# unitary U = Ur + i*Ui becomes the real block
#     [[Ur, -Ui],
#      [Ui,  Ur]]
# applied as a single tensordot over (component, gate qubits).
# ---------------------------------------------------------------------------


def to_real_block(u: np.ndarray) -> np.ndarray:
    """Complex (m, m) matrix -> real (2, m, 2, m) block."""
    u = np.asarray(u)
    ur, ui = np.real(u).astype(np.float32), np.imag(u).astype(np.float32)
    m = u.shape[0]
    block = np.zeros((2, m, 2, m), dtype=np.float32)
    block[0, :, 0, :] = ur
    block[0, :, 1, :] = -ui
    block[1, :, 0, :] = ui
    block[1, :, 1, :] = ur
    return block


def _kq_operands(b, axes, n: int, transpose, state_reshape):
    """Shared setup for the general k-qubit gate einsum (k >= 3): returns
    (block, reshaped state, einsum subscript).  The block's qubit slots
    are permuted to ascending axis order; the state splits into k bit
    axes with gap dims between them.  Ranks stay 2k+2 — fixed small k
    (fused blocks), never circuit-sized."""
    k = len(axes)
    u = b.reshape((2,) + (2,) * k + (2,) + (2,) * k)
    order = sorted(range(k), key=lambda i: axes[i])
    if order != list(range(k)):
        perm = [0] + [1 + p for p in order] + [k + 1] + [
            k + 2 + p for p in order
        ]
        u = transpose(u, perm)
    qs = sorted(axes)
    shape = [2]
    prev = -1
    for q in qs:
        shape += [1 << (q - prev - 1), 2]
        prev = q
    shape.append(1 << (n - 1 - qs[-1]))
    st = state_reshape(tuple(shape))
    # one collision-free label pool: 'x'/'y' are reserved for the real-rep
    # component axes, and fixed per-group offsets ('a'+i vs 'p'+i) collide
    # for k >= 8
    import string

    pool = [c for c in string.ascii_letters if c not in ("x", "y")]
    assert 3 * k + 1 <= len(pool), f"fused block too wide for einsum: k={k}"
    outs = pool[:k]
    ins = pool[k:2 * k]
    gaps = pool[2 * k:3 * k + 1]
    u_sub = "x" + "".join(outs) + "y" + "".join(ins)
    st_sub = "y" + "".join(gaps[i] + ins[i] for i in range(k)) + gaps[k]
    out_sub = "x" + "".join(gaps[i] + outs[i] for i in range(k)) + gaps[k]
    return u, st, f"{u_sub},{st_sub}->{out_sub}"


def diag_of_block(b) -> tuple[np.ndarray, np.ndarray] | None:
    """``(re, im)`` diagonal vectors if the HOST-constant real block
    encodes a diagonal complex matrix, else None.

    Diagonal gates dominate several benchmark families post-fusion (cp
    layers in aqft, rz/rzz in hwe: 39-56% of HBM passes), and a diagonal
    application needs no matmul and no transposes — XLA lowers the
    elementwise form to ONE fused HBM pass, where the einsum path's
    transpose-dot-transpose moves ~2.6x the state bytes (measured via
    compiled cost_analysis on the v5e, see PERF.md).  Only trace-time
    numpy constants are inspected; traced (theta-dependent) blocks take
    the general path.
    """
    if not isinstance(b, np.ndarray) or b.ndim != 4:
        return None
    m = b.shape[1]
    i = np.arange(m)
    dr, di = b[0, i, 0, i], b[1, i, 0, i]
    if (
        np.count_nonzero(b[0, :, 0, :] - np.diag(dr)) == 0
        and np.count_nonzero(b[1, :, 0, :] - np.diag(di)) == 0
        and np.count_nonzero(b[0, :, 1, :] + np.diag(di)) == 0
        and np.count_nonzero(b[1, :, 1, :] - np.diag(dr)) == 0
    ):
        return dr, di
    return None


def _diag_broadcast(d: np.ndarray, axes, trail: int = 0):
    """Reshape a [2^k] gate-local diagonal to broadcast against a state
    reshaped per the bit split of :func:`apply_diag`: gate-local bit
    order (axes[0] = MSB) is permuted to ascending qubit order, gap dims
    become 1s.  ``trail`` appends broadcast axes (1 for the lane layout's
    trailing chunk axis)."""
    k = len(axes)
    t = d.reshape((2,) * k)
    order = sorted(range(k), key=lambda i: axes[i])
    if order != list(range(k)):
        t = np.transpose(t, order)
    shape = []
    for _ in range(k):
        shape += [1, 2]
    shape.append(1)
    shape += [1] * trail
    return np.reshape(t, shape)


def apply_diag(state: jnp.ndarray, dr: np.ndarray, di: np.ndarray,
               axes, n: int) -> jnp.ndarray:
    """Apply a diagonal gate (diagonal ``dr + i*di`` over the gate-local
    index, axes[0] = MSB) to a flat real-rep ``[2, 2^n]`` state as one
    fused elementwise pass."""
    k = len(axes)
    qs = sorted(axes)
    shape = []
    prev = -1
    for q in qs:
        shape += [1 << (q - prev - 1), 2]
        prev = q
    shape.append(1 << (n - 1 - qs[-1]))
    st = state.reshape((2,) + tuple(shape))
    re, im = st[0], st[1]
    # match the state dtype so a bf16 serving state is not silently
    # promoted back to f32 by f32 gate constants
    drb = jnp.asarray(_diag_broadcast(dr, axes), dtype=state.dtype)
    dib = jnp.asarray(_diag_broadcast(di, axes), dtype=state.dtype)
    out = jnp.stack([drb * re - dib * im, dib * re + drb * im])
    return out.reshape(2, 1 << n)


def _apply_const_slices(state: jnp.ndarray, block: np.ndarray, axes,
                        n: int) -> jnp.ndarray:
    """Apply a host-constant k<=3-qubit real block as an explicit
    slice-combination: every output sub-block is a coefficient-weighted
    sum of input sub-blocks (strided elementwise FMAs).

    XLA lowers the general einsum path as transpose-dot-transpose — 2.98x
    the minimal state traffic by its own cost model; this form fuses to
    strided loads/FMAs/stores with no transposes and measured 1.39x
    faster on the v5e for a dense 2q gate (benchmarks/gate micro-probe,
    PERF.md).  Zero coefficients (>= 50% of a typical real-rep block) are
    constant-folded away entirely.
    """
    k = len(axes)
    u = block.reshape((2,) + (2,) * k + (2,) + (2,) * k)
    order = sorted(range(k), key=lambda i: axes[i])
    if order != list(range(k)):
        perm = [0] + [1 + p for p in order] + [k + 1] + [
            k + 2 + p for p in order
        ]
        u = np.transpose(u, perm)
    qs = sorted(axes)
    shape = [2]
    prev = -1
    for q in qs:
        shape += [1 << (q - prev - 1), 2]
        prev = q
    shape.append(1 << (n - 1 - qs[-1]))
    st = state.reshape(tuple(shape))
    gap_shape = tuple(shape[i] for i in range(1, 2 * k + 2, 2)) + (
        shape[-1],
    )

    def comb(out_bits):
        # out_bits = (x, o_0..o_{k-1}); sum over (y, i_0..i_{k-1})
        acc = None
        for in_flat in range(1 << (k + 1)):
            in_bits = tuple(
                (in_flat >> (k - j)) & 1 for j in range(k + 1)
            )
            coef = float(u[out_bits + in_bits])
            if coef == 0.0:
                continue
            idx = (in_bits[0],)
            for j in range(k):
                idx += (slice(None), in_bits[1 + j])
            t = st[idx] if coef == 1.0 else coef * st[idx]
            acc = t if acc is None else acc + t
        if acc is None:
            acc = jnp.zeros(gap_shape, state.dtype)
        return acc

    def build(prefix):
        # stacks happen bottom-up: o_{k-1} first onto the gap-only
        # tensor [g0..gk] at axis k, ..., o_{j-1} at axis j (between
        # g_{j-1} and g_j), finally x at axis 0
        j = len(prefix)
        if j == k + 1:
            return comb(tuple(prefix))
        parts = [build(prefix + (b,)) for b in (0, 1)]
        return jnp.stack(parts, axis=j)

    out = build(())
    return out.reshape(2, 1 << n)


def _apply_masked_slices(state: jnp.ndarray, block, axes, n: int,
                         mask: np.ndarray) -> jnp.ndarray:
    """Apply a TRACED k<=3-qubit real block as a slice-combination,
    skipping terms that a host-known ``mask`` proves are zero.

    The streamed engines gather slot blocks from per-instantiation
    constant tables on device, so the block values are traced — but the
    TABLE is host-known, and the union nonzero pattern over all
    instantiations (25-75% on the QPD endpoint blocks) is a static
    superset of every gathered block's support.  Masked terms are exact
    zeros for every variant, so skipping them is exact; the rest lower
    to strided FMAs with per-variant scalar coefficients — no
    transpose-dot-transpose (the einsum path moves ~3x the state bytes,
    PERF.md).  ``mask`` has the block's [2, m, 2, m] shape."""
    k = len(axes)
    u = block.reshape((2,) + (2,) * k + (2,) + (2,) * k)
    um = np.asarray(mask).reshape((2,) + (2,) * k + (2,) + (2,) * k)
    order = sorted(range(k), key=lambda i: axes[i])
    if order != list(range(k)):
        perm = [0] + [1 + p for p in order] + [k + 1] + [
            k + 2 + p for p in order
        ]
        u = jnp.transpose(u, perm)
        um = np.transpose(um, perm)
    qs = sorted(axes)
    shape = [2]
    prev = -1
    for q in qs:
        shape += [1 << (q - prev - 1), 2]
        prev = q
    shape.append(1 << (n - 1 - qs[-1]))
    st = state.reshape(tuple(shape))
    gap_shape = tuple(shape[i] for i in range(1, 2 * k + 2, 2)) + (
        shape[-1],
    )

    def comb(out_bits):
        acc = None
        for in_flat in range(1 << (k + 1)):
            in_bits = tuple(
                (in_flat >> (k - j)) & 1 for j in range(k + 1)
            )
            if not um[out_bits + in_bits]:
                continue
            idx = (in_bits[0],)
            for j in range(k):
                idx += (slice(None), in_bits[1 + j])
            t = u[out_bits + in_bits] * st[idx]
            acc = t if acc is None else acc + t
        if acc is None:
            acc = jnp.zeros(gap_shape, state.dtype)
        return acc

    def build(prefix):
        j = len(prefix)
        if j == k + 1:
            return comb(tuple(prefix))
        parts = [build(prefix + (b,)) for b in (0, 1)]
        return jnp.stack(parts, axis=j)

    return build(()).reshape(2, 1 << n)


def apply_matrix(state: jnp.ndarray, block, axes, n: int | None = None,
                 zero_mask: np.ndarray | None = None) -> jnp.ndarray:
    """Apply a 1- or 2-qubit gate (real block from ``to_real_block``, or a
    complex matrix converted on the fly) to a flat real-rep state
    ``[2, 2^n]`` on the given qubit indices.

    The flat representation keeps every per-gate program at tensor rank <= 6
    regardless of n — crucial for XLA compile time on 20+ qubit circuits
    (rank-n tensordot chains compile pathologically slowly).

    Gate-local bit order: first index in ``axes`` is the most significant bit
    of the matrix index; qubit 0 is the most significant bit of the flat
    amplitude index (C order).
    """
    if isinstance(block, np.ndarray) and np.iscomplexobj(block):
        block = to_real_block(block)
    if n is None:
        n = int(math.log2(state.shape[-1]))
    d = diag_of_block(block)
    if d is not None:
        return apply_diag(state, d[0], d[1], axes, n)
    if isinstance(block, np.ndarray) and len(axes) <= 3:
        return _apply_const_slices(state, block, axes, n)
    if (
        zero_mask is not None
        and not isinstance(block, np.ndarray)
        and len(axes) <= 3
    ):
        return _apply_masked_slices(state, block, axes, n, zero_mask)
    b = jnp.asarray(block, dtype=state.dtype)
    if len(axes) == 1:
        q = axes[0]
        st = state.reshape(2, 1 << q, 2, 1 << (n - 1 - q))
        out = jnp.einsum("xiyj,yajb->xaib", b, st)
        return out.reshape(2, 1 << n)
    if len(axes) == 2:
        qa, qb = axes
        u4 = b.reshape(2, 2, 2, 2, 2, 2)  # (c_out, b1o, b2o, c_in, b1i, b2i)
        if qa > qb:
            u4 = jnp.transpose(u4, (0, 2, 1, 3, 5, 4))
            qa, qb = qb, qa
        st = state.reshape(
            2, 1 << qa, 2, 1 << (qb - qa - 1), 2, 1 << (n - 1 - qb)
        )
        out = jnp.einsum("xijykl,yakblc->xaibjc", u4, st)
        return out.reshape(2, 1 << n)
    # k-qubit fused block (ops/fusion.fuse_blocks): one HBM pass for what
    # was >= 2 gate applications on the bandwidth-limited engines
    u, st, sub = _kq_operands(b, axes, n, jnp.transpose, state.reshape)
    out = jnp.einsum(sub, u, st)
    return out.reshape(2, 1 << n)


@dataclass
class CompiledCircuit:
    """Static execution plan for an exact simulation of one circuit."""

    num_sim_qubits: int          # circuit qubits + deferral ancillas
    ops: list                    # (matrix np.ndarray, axes tuple)
    clbit_sources: dict[int, int]  # clbit -> sim-qubit holding its value
    num_clbits: int
    op_names: list | None = None  # per-op source gate name ("_defer" for
                                  # synthetic deferral ops); None after fusion


def compile_circuit(circ: Circuit, fuse: bool = False) -> CompiledCircuit:
    """``fuse=True`` merges adjacent gates (ops/fusion.py) — use on exact
    paths only; the trajectory noise engine needs per-physical-gate ops."""
    n = circ.num_qubits
    ops: list[tuple[np.ndarray, tuple[int, ...]]] = []
    names: list[str] = []
    clbit_sources: dict[int, int] = {}
    next_anc = n

    # which instruction index is the last op touching each qubit?
    last_touch = [-1] * n
    for idx, ins in enumerate(circ.instructions):
        if ins.name == "barrier":
            continue
        for q in ins.qubits:
            last_touch[q] = idx

    for idx, ins in enumerate(circ.instructions):
        if ins.name == "barrier":
            continue
        if ins.name == "measure":
            (q,), (c,) = ins.qubits, ins.clbits
            if c in clbit_sources:
                raise NotImplementedError(f"clbit {c} measured twice")
            if last_touch[q] == idx:
                clbit_sources[c] = q  # terminal measure: read qubit directly
            else:
                anc = next_anc
                next_anc += 1
                ops.append((CX, (q, anc)))
                names.append("_defer")
                clbit_sources[c] = anc
            continue
        if ins.name == "reset":
            (q,) = ins.qubits
            if last_touch[q] == idx:
                continue  # nothing observes the qubit afterwards
            anc = next_anc
            next_anc += 1
            ops.append((SWAP, (q, anc)))
            names.append("_defer")
            continue
        if ins.condition is not None:
            cbit, val = ins.condition
            if cbit not in clbit_sources:
                raise ValueError(f"condition on unwritten clbit {cbit}")
            src = clbit_sources[cbit]
            if val != 1:
                raise NotImplementedError("only c_if(bit == 1) supported")
            if ins.name == "x":
                ops.append((CX, (src, ins.qubits[0])))
                names.append("_defer")
            elif ins.name == "z":
                ops.append((CZ, (src, ins.qubits[0])))
                names.append("_defer")
            else:
                raise NotImplementedError(f"conditioned {ins.name}")
            continue
        if ins.name == "unitary":
            ops.append((np.asarray(ins.op), tuple(ins.qubits)))
            names.append("unitary")
            continue
        ops.append((ins.matrix(), tuple(ins.qubits)))
        names.append(ins.name)

    if fuse:
        from .fusion import fuse_ops

        ops = fuse_ops(ops)
        return CompiledCircuit(next_anc, ops, clbit_sources, circ.num_clbits)
    assert len(names) == len(ops)
    return CompiledCircuit(
        next_anc, ops, clbit_sources, circ.num_clbits, op_names=names
    )


def run_statevector(compiled: CompiledCircuit) -> jnp.ndarray:
    """Final flat real-rep state ``[2, 2^num_sim_qubits]`` (float32)."""
    n = compiled.num_sim_qubits
    blocks = [(to_real_block(u), axes) for u, axes in compiled.ops]

    @jax.jit
    def _run():
        state = jnp.zeros((2, 1 << n), dtype=jnp.float32)
        state = state.at[0, 0].set(1.0)
        for b, axes in blocks:
            state = apply_matrix(state, b, axes, n)
        return state

    return _run()


@dataclass
class Distribution:
    """Dense probability/quasi-probability vector over a subset of clbits.

    ``values[i]`` is the weight of the outcome whose written clbits spell the
    binary expansion of ``i`` with ``bit_positions[j]`` holding bit j (LSB
    first).  Unwritten clbits are implicitly 0, matching the reference where
    fragments leave untouched clbits at 0
    (qvm/virtual_circuit.py:116-131, quasi_distr.py:13-20).
    """

    values: np.ndarray          # [2^k] float32
    bit_positions: list[int]    # global clbit index per local bit (sorted)
    num_clbits: int

    def to_dict(self, tol: float = 0.0) -> dict[int, float]:
        vals = np.asarray(self.values)
        out: dict[int, float] = {}
        for i in np.nonzero(np.abs(vals) > tol)[0]:
            key = 0
            for j, pos in enumerate(self.bit_positions):
                if (int(i) >> j) & 1:
                    key |= 1 << pos
            out[key] = float(vals[i])
        return out


def probabilities(
    compiled: CompiledCircuit, state: jnp.ndarray | None = None
) -> Distribution:
    """Exact outcome distribution over written clbits."""
    if state is None:
        state = run_statevector(compiled)
    positions = sorted(compiled.clbit_sources)
    sources = [compiled.clbit_sources[c] for c in positions]
    probs = _marginalize(state, sources)
    return Distribution(np.asarray(probs), positions, compiled.num_clbits)


@jax.jit
def _abs2(state):
    """Flat real-rep state [2, 2^n] -> probability vector [2^n]."""
    return jnp.sum(state * state, axis=0)


def marginalize_flat(
    probs: jnp.ndarray, n: int, keep_axes: list[int]
) -> jnp.ndarray:
    """Sum a [2^n] probability vector over qubits not in keep_axes via
    pairwise reductions (rank <= 3 per step), then reorder the kept bits so
    keep_axes[0] is the LSB of the flattened index."""
    kept = list(range(n))
    cur = n
    for q in sorted(
        (a for a in range(n) if a not in keep_axes), reverse=True
    ):
        pos = kept.index(q)
        probs = probs.reshape(1 << pos, 2, 1 << (cur - 1 - pos)).sum(axis=1)
        probs = probs.reshape(-1)
        kept.pop(pos)
        cur -= 1
    if kept:
        # flat bits are currently little-endian over kept *descending*
        # (qubit 0 is the MSB of the amplitude index); reorder so
        # keep_axes[0] is the LSB.  permute_bits_flat keeps the program
        # rank bounded (run-compressed transpose or on-device gather) —
        # naive (2,)*m transposes at m~24 stall the TPU compiler.
        from .bits import permute_bits_flat

        probs = permute_bits_flat(
            probs.reshape(-1), list(reversed(kept)), list(keep_axes)
        )
    return probs.reshape(-1)


def _marginalize(state: jnp.ndarray, keep_axes: list[int]) -> jnp.ndarray:
    """|amp|^2 then marginalise onto keep_axes (flat state [2, 2^n])."""
    n = int(math.log2(state.shape[-1]))
    return marginalize_flat(_abs2(state), n, keep_axes)


def simulate_circuit(circ: Circuit) -> Distribution:
    """Exact end-to-end: compile + run + marginalise. The uncut-circuit
    oracle used by the fidelity harness (reference: Utilities.py:39-69)."""
    return probabilities(compile_circuit(circ, fuse=True))


def apply_matrix_host(state: np.ndarray, u, axes, n: int) -> np.ndarray:
    """Host (numpy) twin of :func:`apply_matrix` for [2, 2^n] real-rep
    states (same einsum contractions, same bit conventions)."""
    b = to_real_block(u) if np.iscomplexobj(u) or u.ndim == 2 else u
    if len(axes) == 1:
        q = axes[0]
        st = state.reshape(2, 1 << q, 2, 1 << (n - 1 - q))
        return np.einsum("xiyj,yajb->xaib", b, st).reshape(2, 1 << n)
    if len(axes) == 2:
        qa, qb = axes
        u6 = b.reshape(2, 2, 2, 2, 2, 2)
        if qa > qb:
            u6 = u6.transpose(0, 2, 1, 3, 5, 4)
            qa, qb = qb, qa
        st = state.reshape(
            2, 1 << qa, 2, 1 << (qb - qa - 1), 2, 1 << (n - 1 - qb)
        )
        return np.einsum("xijykl,yakblc->xaibjc", u6, st).reshape(2, 1 << n)
    u, st, sub = _kq_operands(b, axes, n, np.transpose, state.reshape)
    return np.einsum(sub, u, st).reshape(2, 1 << n)


def run_statevector_host(compiled: CompiledCircuit) -> np.ndarray:
    """Host (numpy) twin of :func:`run_statevector`: the uncut-circuit
    oracle for 20+ qubit circuits, where a 2^n-buffer program must never
    be compiled through the tunneled TPU backend (compile time scales
    with buffer size — see bench_impl.py).  Untimed correctness path."""
    n = compiled.num_sim_qubits
    state = np.zeros((2, 1 << n), np.float32)
    state[0, 0] = 1.0
    for u, axes in compiled.ops:
        state = apply_matrix_host(state, u, axes, n)
    return state


def simulate_circuit_host(circ: Circuit) -> Distribution:
    """Host (numpy) twin of :func:`simulate_circuit` — same Distribution,
    no device program of any size."""
    from .bits import permute_bits_flat_np

    compiled = compile_circuit(circ, fuse=True)
    n = compiled.num_sim_qubits
    state = run_statevector_host(compiled)
    probs = (state * state).sum(0)

    positions = sorted(compiled.clbit_sources)
    keep = [compiled.clbit_sources[c] for c in positions]
    kept = list(range(n))
    for q in sorted((a for a in range(n) if a not in keep), reverse=True):
        pos = kept.index(q)
        cur = len(kept)
        probs = probs.reshape(1 << pos, 2, 1 << (cur - 1 - pos)).sum(1)
        probs = probs.reshape(-1)
        kept.pop(pos)
    # little-endian bit j of the kept flat index carries sim qubit
    # kept[m-1-j]; the Distribution convention wants bit j to carry
    # positions[j]'s source qubit keep[j]
    m = len(kept)
    if m:
        probs = permute_bits_flat_np(
            probs, list(reversed(kept)), keep
        )
    return Distribution(
        probs.astype(np.float32), positions, compiled.num_clbits
    )
