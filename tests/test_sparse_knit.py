"""Sparse dict-algebra knit (reference algorithm) vs the tensor knit."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_all_fragments,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.sparse_knit import (
    sparse_knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(circ, cap):
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _dense_to_dict(dist):
    vals = np.asarray(dist.values, dtype=np.float64)
    out = {}
    for i in np.nonzero(np.abs(vals) > 1e-4)[0]:
        key = 0
        for j, p in enumerate(dist.bit_positions):
            if (int(i) >> j) & 1:
                key |= 1 << p
        out[key] = vals[i]
    return out


@pytest.mark.parametrize("builder", ["ghz", "mixed"])
def test_sparse_knit_matches_tensor(builder):
    n = 5
    circ = Circuit(n, n)
    if builder == "ghz":
        circ.h(0)
        for i in range(n - 1):
            circ.cx(i, i + 1)
    else:
        rng = np.random.default_rng(2)
        for q in range(n):
            circ.ry(float(rng.standard_normal()), q)
        for i in range(n - 1):
            circ.cx(i, i + 1)
        circ.rzz(0.4, 0, n - 1)
    for q in range(n):
        circ.measure(q, q)

    virt = _cut(circ, 3)
    results = run_all_fragments(virt)

    dense = knit(virt, results)
    sparse = sparse_knit(virt, results)

    want = _dense_to_dict(dense)
    got = {k: v for k, v in sparse.items() if abs(v) > 1e-4}
    assert set(got) == set(want), (set(got) ^ set(want))
    for key, val in want.items():
        assert got[key] == pytest.approx(val, abs=2e-4), key


def test_sampled_sparse_rows_knit_converges_to_exact():
    """sampled_sparse_fragment_rows + sparse_knit (the reference's full
    counts->QuasiDistr->hierarchical-knit data path, incl. its 1e-5
    pruning) converges to the exact dense knit at large shot counts."""
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.sparse_knit import (
        sampled_sparse_fragment_rows,
        sparse_knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )

    circ = Circuit(8, 8)
    circ.h(0)
    for i in range(7):
        circ.cx(i, i + 1)
    for q in range(8):
        circ.measure(q, q)
    virt = _cut(circ, 5)
    rows = {
        reg.name: sampled_sparse_fragment_rows(
            virt, reg.name, shots=100_000, seed=11 + i
        )
        for i, reg in enumerate(virt.fragments)
    }
    q = sparse_knit(virt, rows=rows).nearest_probability_distribution()
    fid = hellinger_fidelity(q.to_dict(), simulate_circuit(circ))
    # statistical bound at 100k shots (seed-sensitive at the 1e-3 level:
    # engine float rounding shifts same-seed multinomial draws)
    assert fid > 0.998, fid
