"""BASELINE.json config #1: BV-5, 2 partitions, exactly one wire cut."""
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    compare_original_with_cut,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)


def test_bv5_single_wire_cut_exact():
    circ = genCirc("bv", 5, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=10,
        forceNWireCuts=1, forceNGateCuts=0, maxNCuts=1,
    )
    assert cutter.solve()
    S, A, L, nW, nG, Q, Q_p, C, C_p = cutter.getModelKeyResults()
    assert (nW, nG) == (1, 0)
    assert S == 8  # one wire QPD cut = 8x sampling overhead
    res = compare_original_with_cut(circ, cutter.getResultCircs()[3])
    assert res.cut_vs_uncut_fidelity > 1 - 1e-5
