"""Gate fusion: exact equivalence + op-count reduction."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.fusion import (
    fuse_ops,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    compile_circuit,
    probabilities,
)


def _dense_unitary(ops, n):
    """Build the full 2^n unitary from an op list (little test oracle)."""
    u = np.eye(1 << n, dtype=complex)
    for mat, axes in ops:
        mat = np.asarray(mat, dtype=complex)
        full = np.zeros((1 << n, 1 << n), dtype=complex)
        for col in range(1 << n):
            bits = [(col >> (n - 1 - q)) & 1 for q in range(n)]
            mcol = 0
            for q in axes:
                mcol = (mcol << 1) | bits[q]
            for mrow in range(mat.shape[0]):
                amp = mat[mrow, mcol]
                if amp == 0:
                    continue
                nb = list(bits)
                for j, q in enumerate(axes):
                    nb[q] = (mrow >> (len(axes) - 1 - j)) & 1
                row = 0
                for q in range(n):
                    row = (row << 1) | nb[q]
                full[row, col] += amp
        u = full @ u
    return u


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fused_unitary_equals_unfused(seed):
    rng = np.random.default_rng(seed)
    n = 4
    ops = []
    names = ["h", "t", "s", "x"]
    circ = Circuit(n, 0)
    for _ in range(25):
        r = rng.integers(0, 3)
        if r < 2:
            getattr(circ, names[rng.integers(0, len(names))])(
                int(rng.integers(0, n))
            )
        else:
            a, b = rng.choice(n, size=2, replace=False)
            (circ.cx if rng.integers(0, 2) else circ.cz)(int(a), int(b))
    ops = [(ins.matrix(), tuple(ins.qubits)) for ins in circ.instructions]
    fused = fuse_ops(ops)
    assert len(fused) < len(ops)
    np.testing.assert_allclose(
        _dense_unitary(fused, n), _dense_unitary(ops, n), atol=1e-10
    )


def test_fused_simulation_matches(monkeypatch):
    circ = genCirc("sup", 12, 1)
    unfused = probabilities(compile_circuit(circ, fuse=False))
    fused = probabilities(compile_circuit(circ, fuse=True))
    assert fused.bit_positions == unfused.bit_positions
    np.testing.assert_allclose(
        np.asarray(fused.values), np.asarray(unfused.values), atol=1e-6
    )


def test_fusion_shrinks_supremacy():
    circ = genCirc("sup", 20, 1)
    plain = compile_circuit(circ, fuse=False)
    fused = compile_circuit(circ, fuse=True)
    assert len(fused.ops) < 0.7 * len(plain.ops), (
        len(fused.ops), len(plain.ops)
    )


def test_block_fusion_three_qubit_differential():
    """fuse_blocks (3q blocks) + the 3q apply_matrix case must reproduce
    the unfused op stream exactly, for random streams and axis orders."""
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.fusion import (
        _expand,
        fuse_blocks,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        apply_matrix,
        apply_matrix_host,
        to_real_block,
    )

    rng = np.random.default_rng(11)

    def rand_u(k):
        m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
            size=(1 << k, 1 << k)
        )
        q, _ = np.linalg.qr(m)
        return q

    n = 6
    state0 = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi0 = state0[0] + 1j * state0[1]

    # 3q apply vs full-unitary lift, several axis orders (device + host)
    for axes in [(0, 1, 2), (2, 0, 4), (5, 1, 3), (4, 2, 0)]:
        u = rand_u(3)
        want = _expand(u, axes, tuple(range(n))) @ psi0
        got = np.asarray(
            apply_matrix(jnp.asarray(state0), to_real_block(u), axes, n)
        )
        np.testing.assert_allclose(got[0] + 1j * got[1], want, atol=1e-5)
        goth = apply_matrix_host(state0.copy(), u, axes, n)
        np.testing.assert_allclose(goth[0] + 1j * goth[1], want, atol=1e-5)

    # random stream: fused == unfused, and blocks stay <= 3 qubits
    ops = []
    for _ in range(25):
        k = int(rng.integers(1, 3))
        axes = tuple(rng.choice(n, size=k, replace=False).tolist())
        ops.append((rand_u(k), axes))
    fused = fuse_blocks(ops, 3)
    assert all(len(ax) <= 3 for _, ax in fused)
    assert len(fused) < len(ops)
    want = psi0.copy()
    for u, axes in ops:
        want = _expand(u, axes, tuple(range(n))) @ want
    got = psi0.copy()
    for u, axes in fused:
        got = _expand(u, axes, tuple(range(n))) @ got
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_wide_block_einsum_labels():
    """k up to 9 must produce collision-free einsum labels (fixed per-group
    offsets collided 'x' with the gap labels at k=8)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.fusion import (
        _expand,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        apply_matrix_host,
    )

    rng = np.random.default_rng(5)
    n = 10
    state0 = rng.normal(size=(2, 1 << n)).astype(np.float32)
    psi0 = state0[0] + 1j * state0[1]
    for k in (8, 9):
        m = rng.normal(size=(1 << k, 1 << k)) + 1j * rng.normal(
            size=(1 << k, 1 << k)
        )
        u, _ = np.linalg.qr(m)
        axes = tuple(rng.choice(n, size=k, replace=False).tolist())
        want = _expand(u, axes, tuple(range(n))) @ psi0
        got = apply_matrix_host(state0.copy(), u, axes, n)
        np.testing.assert_allclose(got[0] + 1j * got[1], want, atol=1e-4)
