"""VQE on a CUT circuit: transverse-field Ising chain ground state.

The full gradient-based VQE loop on a circuit split across two
partitions — the reference can only sample distributions from its ansatz
generators; it has no observables, no gradients, no optimisation loop.

Pipeline:  Pauli Hamiltonian -> qubit-wise-commuting measurement groups
(one cut-circuit execution each, sharing ONE cut plan) -> differentiable
sweep per group -> a single jitted ``energy(theta)`` -> gradient descent
to the ground state, checked against dense diagonalization.

Run: python examples/vqe.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    Circuit,
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (  # noqa: E402
    dense_matrix,
    make_hamiltonian_energy,
)

N = 6


def tfim(n, j=1.0, h=0.7):
    """H = -J sum Z_i Z_{i+1} - h sum X_i."""
    terms = []
    for i in range(n - 1):
        zz = ["I"] * n
        zz[i] = zz[i + 1] = "Z"
        terms.append((-j, "".join(zz)))
    for i in range(n):
        x = ["I"] * n
        x[i] = "X"
        terms.append((-h, "".join(x)))
    return terms


N_LAYERS = 2
N_PARAMS = (N_LAYERS + 1) * N


def ansatz(thetas) -> Circuit:
    c = Circuit(N, N)
    k = 0
    for layer in range(N_LAYERS):
        for q in range(N):
            c.ry(ParamRef(k, float(thetas[k])), q)
            k += 1
        for i in range(N - 1):
            c.cx(i, i + 1)
    for q in range(N):
        c.ry(ParamRef(k, float(thetas[k])), q)
        k += 1
    return c


def main() -> None:
    terms = tfim(N)
    e_min = float(np.linalg.eigvalsh(dense_matrix(terms, N))[0])

    theta0 = np.linspace(0.2, 1.9, N_PARAMS)
    energy, info = make_hamiltonian_energy(
        ansatz(theta0),
        dict(maxNPartitions=2, maxNQubitsPerPartition=4,
             maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5),
        terms,
    )
    print(f"{len(terms)} Pauli terms -> {info.n_groups} measurement "
          f"groups, {info.n_params} trainable parameters, "
          f"{info.instances_per_step} QPD instances per energy eval")

    @jax.jit
    def step(th):
        e, g = jax.value_and_grad(energy)(th)
        return e, th - 0.1 * g

    th = jnp.asarray(theta0, jnp.float32)
    for i in range(150):
        e, th = step(th)
        if i % 30 == 0:
            print(f"step {i:3d}  E = {float(e):+.6f}")
    e_final = float(step(th)[0])
    print(f"final     E = {e_final:+.6f}   exact ground state: {e_min:+.6f}")
    # the ry/cx-chain ansatz's own variational minimum is ~-6.009 (checked
    # by optimising the same ansatz against the dense matrix directly);
    # the cut pipeline must land there — within 1.5% of the spectral width
    # of the true ground state
    width = float(np.ptp(np.linalg.eigvalsh(dense_matrix(terms, N))))
    assert e_final < e_min + 0.015 * width, (e_final, e_min)


if __name__ == "__main__":
    main()
