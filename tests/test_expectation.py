"""Observable estimation: <Z_S> via per-fragment scalar contraction vs the
full knitted distribution."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    expectation_z,
    knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_all_fragments,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _setup():
    rng = np.random.default_rng(9)
    n = 6
    circ = Circuit(n, n)
    for q in range(n):
        circ.ry(float(rng.standard_normal()), q)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.rzz(0.5, 0, n - 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    results = run_all_fragments(virt)
    return virt, results


def _expect_from_dist(dist, z_clbits):
    vals = np.asarray(dist.values, dtype=np.float64)
    total = 0.0
    for i, v in enumerate(vals):
        parity = 0
        for c in z_clbits:
            parity ^= (i >> dist.bit_positions.index(c)) & 1
        total += v * (1 - 2 * parity)
    return total


@pytest.mark.parametrize("z", [[0], [5], [0, 5], [1, 2, 3], [0, 1, 2, 3, 4, 5]])
def test_expectation_z_matches_distribution(z):
    virt, results = _setup()
    full = knit(virt, results)
    want = _expect_from_dist(full, z)
    got = expectation_z(virt, results, z)
    assert got == pytest.approx(want, abs=2e-6), (z, got, want)


def test_expectation_identity_is_total():
    virt, results = _setup()
    full = knit(virt, results)
    got = expectation_z(virt, results, [])
    assert got == pytest.approx(float(np.sum(full.values)), abs=2e-6)


def test_streamed_expectation_matches_batched():
    """streamed_expectation_z (scalar carry in the scan) vs the batched
    expectation_z and the knitted-distribution oracle, on a mixed cut."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        streamed_expectation_z,
    )

    virt, results = _setup()
    full = knit(virt, results)
    for z in ([0], [0, 3], [1, 4, 5], [0, 1, 2, 3, 4, 5]):
        want = _expect_from_dist(full, z)
        batched = expectation_z(virt, results, z)
        streamed = streamed_expectation_z(virt, z, chunk=8)
        assert abs(batched - want) < 2e-6, (z, batched, want)
        assert abs(streamed - want) < 1e-5, (z, streamed, want)


def test_streamed_noisy_expectation():
    """Noisy observable serving: the scalar-carry expectation under the
    trajectory-noise engine agrees with the parity computed from the
    noisy streamed distribution (same seed/engine)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        run_virtual_circuit_streamed,
        streamed_expectation_z,
    )

    virt, _ = _setup()
    nm = NoiseModel("test", p1=0.003, p2=0.02,
                    readout01=0.01, readout10=0.02, trajectories=3)
    dist = run_virtual_circuit_streamed(
        virt, chunk=8, noise=nm, seed=5, project=False
    )
    for z in ([0], [1, 4]):
        want = _expect_from_dist(dist, z)
        got = streamed_expectation_z(virt, z, chunk=8, noise=nm, seed=5)
        assert abs(got - want) < 1e-5, (z, got, want)
