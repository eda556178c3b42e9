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
