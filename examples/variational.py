"""Variational optimisation on a CUT circuit (differentiable sweep).

The reference's ansatz generators (qcg/hw_efficient_ansatz.py,
qcg/uccsd_ansatz.py) are sampling-only — it has no gradient story.  Here
the cut-sim-knit pipeline is differentiable end-to-end: build the ansatz
with ``ParamRef`` parameters, cut it once, and ``jax.grad`` flows through
the knitted distribution to the circuit parameters.  One compiled program
serves every theta (and its gradient); the cut plan, QPD slot tables and
knit weights stay trace-time constants.

Here: a 6-qubit, 2-partition VQE-style minimisation of <Z...Z>, driven to
the exact ground state (-1) by plain gradient descent.

Run: python examples/variational.py
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (  # noqa: E402
    make_differentiable_sweep,
    pauli_z_diagonal,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

N = 6


def ansatz(thetas) -> Circuit:
    """ry/cx-chain/rx layers; every rotation angle is a ParamRef so the
    differentiable binder maps it to a position in the theta vector."""
    c = Circuit(N, N)
    for q in range(N):
        c.ry(ParamRef(q, float(thetas[q])), q)
    for i in range(N - 1):
        c.cx(i, i + 1)
    for q in range(N):
        c.rx(ParamRef(N + q, float(thetas[N + q])), q)
    for q in range(N):
        c.measure(q, q)
    return c


def main() -> None:
    theta0 = np.linspace(0.3, 2.1, 2 * N)

    # cut once (host): two 3-qubit fragments
    cutter = Cutter(
        ansatz(theta0), maxNPartitions=2, maxNQubitsPerPartition=4,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    runner, n_params = make_differentiable_sweep(virt)
    print(f"{n_params} trainable parameters, "
          f"{virt.total_instantiations()} QPD instances per step")

    diag = jnp.asarray(pauli_z_diagonal(sorted(range(N)), set(range(N))))

    @jax.jit
    def step(th):
        e, g = jax.value_and_grad(
            lambda t: jnp.sum(runner(t) * diag)
        )(th)
        return e, th - 0.5 * g

    th = jnp.asarray(theta0, jnp.float32)
    for i in range(40):
        e, th = step(th)
        if i % 10 == 0:
            print(f"step {i:3d}  <Z...Z> = {float(e):+.6f}")
    e_final = float(step(th)[0])
    print(f"final     <Z...Z> = {e_final:+.6f}  (exact ground state: -1)")
    assert e_final < -0.99


if __name__ == "__main__":
    main()
