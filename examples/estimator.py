"""Monte-Carlo QPD estimation: distributions, observables, stochastic VQE.

The exact engines enumerate every QPD label — optimal for few cuts, but
the label grid grows as ``prod_g n_g``.  The sampled estimator family
(ops/qpd_sampling.py, ops/sweep.make_sampled_sweep) serves the many-cut
regime at a chosen budget, with a toolbox of free variance reducers
that all compose:

  * ``sample_method="lhs"`` — balanced labels (per-cut counts pinned),
  * ``head_labels=`` — stratified: heaviest labels exact, tail sampled,
  * ``sample_cv=True`` / ``control_variate=True`` — regression against
    the signed total mass, whose exact expectation (1) is known,
  * ``sample_eps=`` — adaptive budget until the empirical stderr
    meets the target.

The reference enumerates everything (qvm/run.py:36-42) — it has no
estimator, no stderr, no accuracy dial.

Run: env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/estimator.py
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (  # noqa: E402
    dense_matrix,
    make_hamiltonian_energy,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (  # noqa: E402
    sampled_expectation_z,
    sampled_expectation_z_adaptive,
    sampling_overhead,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

N = 8


def build_cut(n=N):
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return circ, VirtualCircuit(cutter.getResultCircs()[3])


def main():
    circ, virt = build_cut()
    over = sampling_overhead(virt, eps=0.02)
    print(f"cut plan: gamma_total={over['gamma_total']:.1f} "
          f"kappa={over['kappa']:.0f} "
          f"(Hoeffding budget for eps=0.02: {over['shots_for_eps']})")
    ideal = simulate_circuit(circ)

    # 1) distribution estimate, eps-targeted, with every reducer on
    dist, info = run_virtual_circuit(
        virt, engine="sampled", sample_eps=0.01, sample_method="lhs",
        sample_cv=True, head_labels=8, seed=0,
    )
    print(f"sampled knit (eps=0.01, lhs+cv+head): fidelity "
          f"{hellinger_fidelity(ideal, dist):.5f} "
          f"in {info.run_time:.2f}s")

    # 2) observables without any distribution: GHZ parities.  The CV is
    #    exact wherever the observable tracks the total mass.
    z_sets = [[0, 1], [3, 4], [0, N - 1], [0]]
    est, se = sampled_expectation_z(
        virt, z_sets, 4000, seed=1, with_stderr=True,
        control_variate=True, method="lhs",
    )
    for zs, e, s in zip(z_sets, est, se):
        print(f"  <Z{zs}> = {e:+.4f} +- {s:.4f}")

    # 3) accuracy-dialled observables
    est, se, used = sampled_expectation_z_adaptive(
        virt, [[0, 1], [0, N - 1]], eps=0.01, control_variate=True,
    )
    print(f"adaptive observables: eps=0.01 met with {used} samples "
          f"(worst stderr {se.max():.4f})")

    # 4) stochastic VQE: the energy is the Monte-Carlo estimator over
    #    ONE fixed label sample — unbiased grads, one compiled program.
    n = 6
    rng = np.random.default_rng(0)
    th0 = rng.uniform(0.2, 1.9, 2 * n)

    def ansatz():
        c = Circuit(n, n)
        for q in range(n):
            c.ry(ParamRef(q, float(th0[q])), q)
        for i in range(n - 1):
            c.cx(i, i + 1)
        for q in range(n):
            c.ry(ParamRef(n + q, float(th0[n + q])), q)
        return c

    terms = []
    for i in range(n - 1):
        p = ["I"] * n
        p[i] = p[i + 1] = "Z"
        terms.append((-1.0, "".join(p)))
    for i in range(n):
        p = ["I"] * n
        p[i] = "X"
        terms.append((-0.7, "".join(p)))

    kw = dict(maxNPartitions=2, maxNQubitsPerPartition=4,
              maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    energy, einfo = make_hamiltonian_energy(
        ansatz(), kw, terms, num_samples=8000, sample_method="lhs",
    )
    e_min = float(np.linalg.eigvalsh(dense_matrix(terms, n))[0])

    @jax.jit
    def step(th):
        e, g = jax.value_and_grad(energy)(th)
        return e, th - 0.1 * g

    th = jnp.asarray(th0, jnp.float32)
    for i in range(100):
        e, th = step(th)
    print(f"stochastic VQE ({einfo.instances_per_step} instances/step): "
          f"E = {float(e):.4f} vs ground {e_min:.4f}")


if __name__ == "__main__":
    main()
