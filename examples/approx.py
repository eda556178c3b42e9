"""Approximate serving with certified error: truncation + stratification.

Two knobs for trading exactness for throughput on cut sets with
parametrized gates (rzz/cp — skewed QPD coefficient products):

  * ``trunc_eps`` (streamed engine): drop the lowest-weight labels with
    a CERTIFIED L1 bound (arXiv:2212.01270 role);
  * ``head_labels`` (sampled engine): enumerate the heaviest labels
    exactly, sample only the tail — stderr scale drops from gamma_total
    to gamma_tail (CV4Quantum's variance-reduction role).

Uniform cut sets (cx/cz/wire) are unaffected by both: truncation keeps
every label below eps = the common weight, stratification falls back to
the plain estimator.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/approx.py
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (  # noqa: E402
    sampled_knit,
    sampling_overhead,
    stratified_split,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (  # noqa: E402
    make_streamed_knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)


def main() -> None:
    import jax

    # an aqft-flavoured circuit: small-angle cp gates spanning the two
    # halves, so the optimal cut set must include a skewed-coefficient
    # cp cut (the solver's cost model prices every gate cut the same —
    # reference parity, Cutter.py:452-471 — so topology decides)
    n = 6
    circ = Circuit(n, n)
    for q in range(n):
        circ.h(q)
    circ.cp(np.pi / 8, 0, n - 1)
    circ.cp(np.pi / 16, 1, n - 2)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)

    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    ideal = simulate_circuit(circ)

    # ---- certified truncation on the streamed engine -------------------
    for eps in (0.0, 1e-3, 3e-2):
        step, xs, meta = make_streamed_knit(virt, 64, trunc_eps=eps,
                                            share_prefix=True)
        values = np.asarray(jax.jit(step)(xs))
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
            Distribution,
        )

        fid = hellinger_fidelity(ideal, Distribution(
            values, meta["positions"], virt.num_clbits))
        print(f"trunc_eps={eps:>6}: labels {meta['kept_labels']}/"
              f"{meta['global_labels']}  certified L1 <= "
              f"{meta['dropped_mass']:.2e}  fidelity={fid:.6f}")

    # ---- stratified sampling ------------------------------------------
    over = sampling_overhead(virt)
    split = stratified_split(virt, 64)
    print(f"gamma_total={over['gamma_total']:.2f}"
          + (f", head gamma={split[3]:.2f} tail gamma={split[4]:.2f}"
             if split else " (no head: uniform weights)"))
    for head in (0, 64, 256):
        for method in ("iid", "lhs"):
            est, se = sampled_knit(virt, 1000, seed=1, with_stderr=True,
                                   head_labels=head, method=method)
            fid = hellinger_fidelity(ideal, est)
            print(f"sampled n=1000 head_labels={head:>4} {method}: "
                  f"fidelity={fid:.4f}  mean stderr="
                  f"{float(np.mean(se)):.2e}")


if __name__ == "__main__":
    main()
