"""QAOA MaxCut on a CUT circuit, optimised by gradient ascent.

The reference generates QAOA circuits (benchmarks/helper_functions.py:34-63
via qcg) but can only sample them.  Here the same generator — built with
``ParamRef`` parameters, whose affine derivations (gamma/2, -2*beta) keep
the theta reference alive — feeds the differentiable cut-sim-knit pipeline:
one jitted ``energy(theta)``, gradients included, on a circuit split across
two partitions.

Problem: MaxCut on the 8-ring.  Cost C = sum_edges (1 - Z_i Z_j)/2; we
minimise E = -C, i.e. terms (+0.5, Z_iZ_j) and constant -|E|/2.  The
generator is the reference's "QAOA+" phase block (its ZZ layer also
applies single-Z phases), whose p=1 landscape maximum on the 8-ring is
4.8939 at (gamma, beta) = (2.463, 1.941) (dense-statevector grid+refine)
— gradient ascent from inside the basin must recover it.

Run: python examples/qaoa.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import networkx as nx  # noqa: E402
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qaoa import (  # noqa: E402
    construct_qaoa_plus,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (  # noqa: E402
    make_hamiltonian_energy,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.jaxcache import (  # noqa: E402
    enable_cache,
)

enable_cache()


def main():
    n = 8
    graph = nx.cycle_graph(n)

    theta0 = np.array([2.0, 1.5], np.float64)  # [gamma, beta]

    def ansatz(th):
        params = [ParamRef(0, th[0]), ParamRef(1, th[1])]
        return construct_qaoa_plus(P=1, G=graph, params=params)

    # E = -C = sum_edges (0.5 * Z_i Z_j) - |E|/2
    terms = []
    for i, j in graph.edges():
        p = ["I"] * n
        p[i] = p[j] = "Z"
        terms.append((0.5, "".join(p)))
    terms.append((-0.5 * graph.number_of_edges(), "I" * n))

    kw = dict(maxNPartitions=2, maxNQubitsPerPartition=n // 2 + 1,
              maxNQpdCuts=8, maxNCuts=8, maxCutsPerPartitions=8)
    energy, info = make_hamiltonian_energy(ansatz(theta0), kw, terms)
    print(f"cut plan shared by {info.n_groups} group(s), "
          f"{info.instances_per_step} QPD instances per energy eval, "
          f"{info.n_params} parameters")

    step = jax.jit(jax.value_and_grad(energy))
    theta = jnp.asarray(theta0, jnp.float32)
    lr = 0.05
    for it in range(200):
        e, g = step(theta)
        theta = theta - lr * g
        if it % 40 == 0:
            print(f"iter {it:3d}  cut value = {-float(e):.6f}")
    e_final = float(energy(theta))
    print(f"final expected cut = {-e_final:.6f}  "
          f"(p=1 landscape optimum = 4.8939, true MaxCut = {n})")
    assert -e_final > 4.8939 - 0.01, "gradient ascent fell short"


if __name__ == "__main__":
    main()
