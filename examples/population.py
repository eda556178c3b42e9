"""Gradient-free VQE on a cut circuit with a population optimiser.

On hardware (or with the shot-sampled / noisy estimators) exact
gradients are unavailable, so the standard variational workhorses are
population methods: SPSA, evolution strategies.  Their compute shape —
evaluate the SAME circuit at many parameter sets per step — is exactly
what a TPU wants: ``ops/optim.py`` folds the whole population into one
vmapped launch (every candidate's full QPD fan-out batched together)
and runs the entire optimisation as a single ``lax.scan`` with zero
host round-trips.  Pass ``mesh=`` to shard the population over ``dp``
across chips.  The reference can only sample its ansatz circuits —
no observables, no optimiser, no serving loop.

Here: the transverse-field Ising chain of examples/vqe.py, minimised
by batched SPSA (4 perturbation pairs -> 8 energies per step, one
launch) and by antithetic NES, both without a single gradient.

Run: python examples/population.py
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.optim import (  # noqa: E402
    nes_minimize,
    spsa_minimize,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.jaxcache import (  # noqa: E402
    enable_cache,
)

enable_cache()

N = 6


def main():
    rng = np.random.default_rng(3)
    th0 = rng.uniform(-0.3, 0.3, 2 * N).astype(np.float32)

    def ansatz():
        c = Circuit(N, N)
        for q in range(N):
            c.ry(ParamRef(q, float(th0[q])), q)
        for i in range(N - 1):
            c.cx(i, i + 1)
        for q in range(N):
            c.ry(ParamRef(N + q, float(th0[N + q])), q)
        return c

    terms = []
    for i in range(N - 1):
        p = ["I"] * N
        p[i] = p[i + 1] = "Z"
        terms.append((-1.0, "".join(p)))
    for i in range(N):
        p = ["I"] * N
        p[i] = "X"
        terms.append((-0.7, "".join(p)))

    kw = dict(maxNPartitions=2, maxNQubitsPerPartition=4,
              maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    energy, info = make_hamiltonian_energy(ansatz(), kw, terms)
    e_ground = float(np.linalg.eigvalsh(dense_matrix(terms, N)).min())
    e_start = float(jax.jit(energy)(jnp.asarray(th0)))
    print(f"cut TFIM-{N}: {info.n_groups} measurement groups, "
          f"{info.instances_per_step} QPD instances per energy")
    print(f"start E = {e_start:.4f}   (dense ground state {e_ground:.4f})")

    spsa = spsa_minimize(
        energy, th0, steps=250, key=jax.random.PRNGKey(0),
        pairs=4, a=0.4, c=0.12,
    )
    print(f"SPSA   ({spsa.evaluations} evals, all on device): "
          f"E = {spsa.energy:.4f}")

    nes = nes_minimize(
        energy, th0, steps=200, key=jax.random.PRNGKey(1),
        pop=8, sigma=0.15, lr=0.2,
    )
    print(f"NES    ({nes.evaluations} evals, all on device): "
          f"E = {nes.energy:.4f}")

    spread = abs(e_ground)
    assert spsa.energy < e_start - 0.5 * (e_start - e_ground), "SPSA stalled"
    assert nes.energy < e_start - 0.5 * (e_start - e_ground), "NES stalled"
    assert spsa.energy >= e_ground - 1e-3 and nes.energy >= e_ground - 1e-3
    print(f"both optimisers within {max(spsa.energy, nes.energy) - e_ground:.3f} "
          f"of the ground state ({spread:.3f} spectral scale), "
          "gradient-free, one launch per step")


if __name__ == "__main__":
    main()
