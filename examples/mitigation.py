"""Mitigated noisy serving: readout inversion + zero-noise extrapolation.

Flow: zoo circuit -> optimal cut -> noisy observable serving with
calibrated T1/T2 + depolarising noise -> ZNE-mitigated estimate; then
exact readout-error inversion on an uncut noisy distribution.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python examples/mitigation.py
"""
import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.mitigation import (
    mitigate_readout,
    zne_expectation_z,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    NoiseModel,
    simulate_noisy_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def main():
    # GHZ-8 cut into two 5-qubit fragments; <Z^8> = 1 exactly.  The zoo
    # generator measures qubit i -> clbit i; observable serving validates
    # that every Z-support clbit is actually written.
    circ = genCirc("ghz", 8, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    # the zoo generator writes measures into the second clbit register —
    # take the Z support from the circuit itself (the engines validate
    # that every Z-support clbit is actually written)
    z_support = {
        ins.clbits[0] for ins in circ.instructions if ins.name == "measure"
    }
    nm = NoiseModel(p1=0.01, p2=0.05, readout01=0.0, readout10=0.0,
                    t1=20e-6, t2=25e-6, trajectories=96)
    est, vals = zne_expectation_z(
        virt, z_clbits=z_support, noise=nm,
        scales=(1.0, 2.0, 3.0), method="exp", seed=1,
    )
    print(f"<Z^8>  ideal=1.0  raw_noisy={vals[0]:.4f}  "
          f"zne={est:.4f}  (per-scale {['%.4f' % v for v in vals]})")
    assert abs(est - 1.0) <= abs(vals[0] - 1.0)

    # exact readout inversion on the uncut noisy distribution
    nmr = NoiseModel(p1=0.0, p2=0.0, readout01=0.02, readout10=0.05,
                     trajectories=1)
    noisy = simulate_noisy_circuit(circ, nmr, seed=0)
    mit = mitigate_readout(noisy, nmr)
    v, w = np.asarray(noisy.values), np.asarray(mit.values)
    print(f"readout inversion: GHZ mass P(0)+P(255) "
          f"{v[0] + v[-1]:.4f} -> {w[0] + w[-1]:.6f}")
    assert w[0] + w[-1] > 0.9999

    # probabilistic error cancellation on the cut pipeline: the signed
    # quasi-inverse of every depolarising site, sampled with the same
    # estimator family as the QPD knit itself
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        run_noisy_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )

    ideal = np.asarray(simulate_circuit(circ).values)
    kw = dict(p1=0.01, p2=0.05, readout01=0.0, readout10=0.0,
              trajectories=512)
    dn, _ = run_noisy_virtual_circuit(virt, NoiseModel(**kw), seed=5)
    dp, _ = run_noisy_virtual_circuit(
        virt, NoiseModel(**kw, pec=True), seed=5)
    tv_n = 0.5 * np.abs(np.asarray(dn.values) - ideal).sum()
    tv_p = 0.5 * np.abs(np.asarray(dp.values) - ideal).sum()
    print(f"PEC on the cut pipeline: TV vs ideal {tv_n:.4f} -> {tv_p:.4f}")
    assert tv_p < tv_n
    print("OK")


if __name__ == "__main__":
    main()
