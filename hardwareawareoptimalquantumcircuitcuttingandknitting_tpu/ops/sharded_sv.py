"""Amplitude-sharded statevector simulation: fragments larger than one chip.

The single-chip engine (ops/statevector.py) holds the full ``[2, 2^n]``
real-rep state in one device's HBM.  For fragments beyond ~30 qubits the
state itself must be sharded: here the amplitude axis is split over a mesh
axis, each device holding a ``[2, 2^(n-k)]`` block (``2^k`` devices), and
gates are applied inside one ``shard_map``:

  * a gate on *local* qubits (index >= k) is a plain block-local
    ``apply_matrix`` — no communication;
  * a gate touching a *global* qubit (index < k, i.e. a bit of the shard
    index) exchanges partner blocks with ``lax.ppermute`` over ICI and
    mixes them with shard-dependent gate coefficients — the classic
    distributed pair-update, one hop per global qubit.

The final clbit marginal is assembled with a static scatter of each
shard's local marginal into its global-bit slot and a ``psum`` — so the
full 2^n vector never materialises anywhere.

Role in the capability inventory: the reference scales circuit *width*
only by cutting (SURVEY §5); this module is the TPU-native "scale beyond
one device" axis that cutting composes with — fragments are chosen by the
cut planner to fit a *mesh*, not a chip.
"""
from __future__ import annotations

import math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .statevector import (
    CompiledCircuit,
    Distribution,
    apply_matrix,
    marginalize_flat,
    to_real_block,
)


def _pair_perm(num_shards: int, mask: int) -> list[tuple[int, int]]:
    return [(s, s ^ mask) for s in range(num_shards)]


class ShardCtx:
    """Amplitude-sharded gate application over one mesh axis.

    Holds the static layout (n sim qubits, 2^k shards on ``axis_name``) and
    dispatches any 1/2-qubit gate to the right local/global case.  Blocks
    may be numpy constants OR jnp tracers — the latter is what the
    sharded *fragment* engine (ops/sharded_fragment.py) feeds it: QPD slot
    matrices that vary along a vmapped variant axis.
    """

    def __init__(self, n: int, num_shards: int, axis_name: str):
        self.n = n
        self.k = int(math.log2(num_shards))
        assert 1 << self.k == num_shards, "mesh axis must be a power of 2"
        assert self.k <= n, (
            f"more shards ({num_shards}) than amplitudes (2^{n})"
        )
        self.num_shards = num_shards
        self.axis_name = axis_name

    # -- helpers ---------------------------------------------------------

    def my_bits(self) -> dict[int, jnp.ndarray]:
        """Per-global-qubit bit value of this shard's index (traced)."""
        idx = lax.axis_index(self.axis_name)
        return {
            q: (idx >> (self.k - 1 - q)) & 1 for q in range(self.k)
        }

    def apply(self, state, block, axes, my_bits):
        """Dispatch one gate on a local block ``[2, 2^(n-k)]``.

        Contract: <= 2 qubits per gate when any qubit is global (index
        < k) — feed this engine unfused or max_qubits=2-fused streams
        only (k-qubit fused blocks are the single-chip engines' trick)."""
        if all(q >= self.k for q in axes):
            return self._gate_local(state, block, axes)
        if len(axes) > 2:
            raise ValueError(
                f"sharded apply supports <= 2-qubit gates on global "
                f"qubits, got {len(axes)} qubits {axes} with k={self.k}"
            )
        if len(axes) == 1:
            return self._gate_1q_global(state, block, axes[0], my_bits)
        if any(q >= self.k for q in axes):
            return self._gate_2q_mixed(state, block, axes, my_bits)
        return self._gate_2q_global(state, block, axes, my_bits)

    def _mask(self, q: int) -> int:
        return 1 << (self.k - 1 - q)

    def _partner(self, x, mask):
        return lax.ppermute(
            x, self.axis_name, _pair_perm(self.num_shards, mask)
        )

    # -- gate cases ------------------------------------------------------

    def _gate_local(self, state, block, axes):
        local_axes = tuple(q - self.k for q in axes)
        return apply_matrix(state, block, local_axes, self.n - self.k)

    def _gate_1q_global(self, state, block, q, my_bits):
        b = jnp.asarray(block, dtype=state.dtype)
        myb = my_bits[q]
        partner = self._partner(state, self._mask(q))
        c_keep = b[:, myb, :, myb]
        c_swap = b[:, myb, :, 1 - myb]
        return (
            jnp.einsum("xy,yi->xi", c_keep, state)
            + jnp.einsum("xy,yi->xi", c_swap, partner)
        )

    def _gate_2q_mixed(self, state, block, axes, my_bits):
        """One global qubit g, one local qubit l."""
        (g, l) = axes
        b6 = jnp.asarray(block, dtype=state.dtype).reshape(
            2, 2, 2, 2, 2, 2
        )
        if g >= self.k:  # gate order (local, global) -> swap operand axes
            g, l = l, g
            b6 = jnp.transpose(b6, (0, 2, 1, 3, 5, 4))
        myb = my_bits[g]
        partner = self._partner(state, self._mask(g))
        # (x, i_l, y, j_l) blocks for the kept / fetched global bit value
        a_keep = b6[:, myb, :, :, myb, :]
        a_swap = b6[:, myb, :, :, 1 - myb, :]
        nl = self.n - self.k
        out = apply_matrix(state, a_keep, (l - self.k,), nl)
        out = out + apply_matrix(partner, a_swap, (l - self.k,), nl)
        return out

    def _gate_2q_global(self, state, block, axes, my_bits):
        """Both qubits global: two ppermute hops, 4-way mix."""
        (g1, g2) = axes
        b6 = jnp.asarray(block, dtype=state.dtype).reshape(
            2, 2, 2, 2, 2, 2
        )
        my1, my2 = my_bits[g1], my_bits[g2]
        p2 = self._partner(state, self._mask(g2))
        # stacked[j2] = block whose g2 bit is j2
        stacked = jnp.stack([
            jnp.where(my2 == 0, state, p2),
            jnp.where(my2 == 0, p2, state),
        ])                                           # [2(j2), 2, local]
        pd = self._partner(stacked, self._mask(g1))
        full = jnp.stack([
            jnp.where(my1 == 0, stacked, pd),
            jnp.where(my1 == 0, pd, stacked),
        ])                                           # [2(j1), 2(j2), 2, local]
        coef = b6[:, my1, my2]                       # (x, y, j1, j2)
        return jnp.einsum("xyab,abyi->xi", coef, full)

    def marginal(self, local_state, keep_axes: list[int]):
        """Per-shard: |amp|^2, local marginal, scatter to global slots,
        psum -> full [2^len(keep_axes)] marginal (replicated)."""
        idx = lax.axis_index(self.axis_name)
        # probabilities accumulate in f32 even for a bf16 serving state
        s32 = local_state.astype(jnp.float32)
        probs = jnp.sum(s32 * s32, axis=0)

        kept_local = [q for q in keep_axes if q >= self.k]
        kept_global = [q for q in keep_axes if q < self.k]
        local_marg = marginalize_flat(
            probs, self.n - self.k, [q - self.k for q in kept_local]
        )

        n_keep = len(keep_axes)
        # static dilation: local marginal bit j -> final bit position of
        # kept_local[j] within keep_axes
        local_pos = [keep_axes.index(q) for q in kept_local]
        spread = np.zeros(1 << len(kept_local), dtype=np.int32)
        for i in range(1 << len(kept_local)):
            v = 0
            for j, pos in enumerate(local_pos):
                if (i >> j) & 1:
                    v |= 1 << pos
            spread[i] = v
        # traced offset from this shard's global kept bits
        offset = jnp.int32(0)
        for q in kept_global:
            bit = (idx >> (self.k - 1 - q)) & 1
            offset = offset + (bit << keep_axes.index(q))

        out = jnp.zeros(1 << n_keep, dtype=local_marg.dtype)
        out = out.at[jnp.asarray(spread) + offset].add(local_marg)
        return lax.psum(out, self.axis_name)


class _Builder(ShardCtx):
    """Per-shard step function for one compiled (static-gate) circuit."""

    def __init__(self, compiled: CompiledCircuit, num_shards: int,
                 axis_name: str):
        super().__init__(compiled.num_sim_qubits, num_shards, axis_name)
        self.compiled = compiled
        self.blocks = [
            (to_real_block(u), axes) for u, axes in compiled.ops
        ]

    def step(self, local_state):
        my_bits = self.my_bits()
        state = local_state
        for block, axes in self.blocks:
            state = self.apply(state, block, axes, my_bits)
        return state


def make_sharded_sim(
    compiled: CompiledCircuit, mesh: Mesh, axis_name: str = "amp"
):
    """Returns (fn, state0, sharding): ``fn(state0)`` -> exact clbit
    marginal (replicated).  ``state0`` is the |0...0> initial state laid
    out as ``[2, 2^n]``, sharded on the amplitude axis; pass it as the
    runtime argument (a constant initial state makes XLA constant-fold the
    whole gate chain at compile time).
    """
    num_shards = mesh.shape[axis_name]
    builder = _Builder(compiled, num_shards, axis_name)
    positions = sorted(compiled.clbit_sources)
    keep_axes = [compiled.clbit_sources[c] for c in positions]

    def per_shard(local_state):
        final = builder.step(local_state)
        return builder.marginal(final, keep_axes)

    sharded = jax.shard_map(
        per_shard,
        mesh=mesh,
        in_specs=P(None, axis_name),
        out_specs=P(),
    )

    state0 = np.zeros((2, 1 << builder.n), dtype=np.float32)
    state0[0, 0] = 1.0
    sharding = NamedSharding(mesh, P(None, axis_name))
    return sharded, state0, sharding, positions


def sharded_probabilities(
    compiled: CompiledCircuit, mesh: Mesh, axis_name: str = "amp"
) -> Distribution:
    """End-to-end: simulate with the amplitude axis sharded over
    ``mesh[axis_name]`` and return the exact outcome distribution."""
    fn, state0, sharding, positions = make_sharded_sim(
        compiled, mesh, axis_name
    )
    jitted = jax.jit(fn, in_shardings=(sharding,))
    values = np.asarray(jitted(jax.device_put(state0, sharding)))
    return Distribution(values, positions, compiled.num_clbits)
