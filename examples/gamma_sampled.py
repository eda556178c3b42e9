"""Angle-aware sampled cutting end-to-end (the qft-16 recipe at
example scale).

The reference's cost model prices every gate cut at a flat 6x sampling
multiplier, so QFT-class circuits are unsolvable (qft-16: S >= 6^15).
``Cutter(gammaMode=True)`` minimises the TRUE QPD 1-norm instead —
cp(theta) costs 1 + 2|sin(theta/2)| -> 1 — and the sampled engine
executes the plan at the promised kappa = gamma^2 budget with balanced
(LHS) labels and a control variate.  See benchmarks/qft16_sampled.py
for the full qft-16 delivery on the v5e.
"""
import math
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E501
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qft import (  # noqa: E501
    library_qft,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (  # noqa: E501
    sampled_knit,
    sampling_overhead,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E501
    simulate_circuit_host,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
    VirtualCircuit,
)

n = 10
rng = np.random.default_rng(3)
circ = Circuit(n, n)
for q in range(n):                      # random product input: a
    circ.h(q)                           # non-degenerate output state
    circ.rz(float(rng.uniform(0, 2 * math.pi)), q)
for ins in library_qft(n).instructions:
    circ.instructions.append(ins.copy())
for q in range(n):
    circ.measure(q, q)

# angle-aware plan: 9 cp cuts isolating an end qubit, gamma ~ 8.5
# (the parity model would price this at S = 6^9 ~ 1e7)
cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=n - 1,
                gammaMode=True)
assert cutter.solve()
virt = VirtualCircuit(cutter.getResultCircs()[3])
over = sampling_overhead(virt)
print(f"plan: {cutter.plan.metrics.n_gate_cuts} cuts, "
      f"gamma_total={over['gamma_total']:.4f}, kappa={over['kappa']:.1f} "
      f"(parity model: S = 6^{cutter.plan.metrics.n_gate_cuts} = "
      f"{6 ** cutter.plan.metrics.n_gate_cuts})")

keep = [0, 1, 2]
est, se = sampled_knit(virt, 20_000, seed=1, keep_clbits=keep,
                       with_stderr=True, method="lhs",
                       control_variate=True)

probs = np.asarray(simulate_circuit_host(circ).values, np.float64)
v = probs.reshape([2] * n)
marg = v.sum(axis=tuple(range(n - len(keep))))
oracle = np.array([
    marg[tuple((b >> j) & 1 for j in reversed(keep))]
    for b in range(1 << len(keep))
])
err = np.abs(np.asarray(est.values, np.float64) - oracle)
print(f"3-bit marginal: max|err|={err.max():.2e} "
      f"(stderr {float(se.max()):.2e})")
assert float(err.max()) <= max(5 * float(se.max()), 1e-3)
print("OK")
