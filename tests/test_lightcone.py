"""Lightcone marginal vs full-simulation marginal."""
import numpy as np

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
    lightcone_circuit,
    lightcone_marginal,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)


def _marginal(full, positions, keep):
    vals = np.asarray(full, dtype=np.float64).reshape(-1)
    out = np.zeros(1 << len(keep))
    for i in range(vals.size):
        key = 0
        for j, p in enumerate(sorted(keep)):
            key |= ((i >> positions.index(p)) & 1) << j
        out[key] += vals[i]
    return out


def test_lightcone_shrinks_and_matches():
    circ = genCirc("syc", 12, 1)
    keep = {0, 1}
    sub, _ = lightcone_circuit(circ, keep)
    assert sub.num_qubits < circ.num_qubits
    got = lightcone_marginal(circ, keep)
    full = simulate_circuit(circ)
    want = _marginal(full.values, full.bit_positions, keep)
    np.testing.assert_allclose(np.asarray(got.values), want, atol=1e-6)


def test_lightcone_ghz_is_full_cone():
    n = 5
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    # qubit n-1's cone reaches back through the whole chain
    sub, _ = lightcone_circuit(circ, {n - 1})
    assert sub.num_qubits == n
    got = lightcone_marginal(circ, {n - 1})
    np.testing.assert_allclose(
        np.asarray(got.values), [0.5, 0.5], atol=1e-6
    )
