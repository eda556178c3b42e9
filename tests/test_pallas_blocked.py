"""Segmented HBM-resident blocked kernel (ops/pallas_blocked.py) —
VERDICT r4 action #2: the VMEM kernel past its measured n=20 boundary.

CPU-scale strategy: interpret-mode differentials against the
whole-variant-in-VMEM kernel (itself differential-locked against the
XLA engine) on fragments FORCED through the blocked path at small
windows, so the segmentation + inter-segment re-tiling machinery is
exercised exactly as at n=21-24."""
import numpy as np
import pytest

import jax.numpy as jnp

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_blocked import (
    make_blocked_chunk_kernel,
    plan_segments,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (
    _plan_ops,
    make_chunk_kernel,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(name, n, depth, cap):
    circ = genCirc(name, n, depth)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _rand_labels(virt, count, seed=3):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(
        0, [vg.spec.num_instantiations for vg in virt.vgates],
        size=(count, len(virt.vgates)),
    ).astype(np.int32))


@pytest.mark.parametrize("window", [8, 9, 10])
def test_blocked_rows_match_vmem_kernel(window):
    virt = _cut("hwe", 16, 3, 10)
    name = virt.fragments[0].name
    rows_ref, pos_ref = make_chunk_kernel(virt, name, 8, interpret=True)
    built = make_blocked_chunk_kernel(
        virt, name, 8, window=window, interpret=True, force=True
    )
    assert built is not None
    rows_blk, pos_blk = built
    assert pos_ref == pos_blk
    lab = _rand_labels(virt, 8)
    np.testing.assert_allclose(
        np.asarray(rows_blk(lab)), np.asarray(rows_ref(lab)), atol=1e-6
    )


def test_blocked_rows_match_on_sup():
    """Supremacy-grid fragment (dense 2q structure stresses the
    lookahead segmentation)."""
    virt = _cut("sup", 12, 1, 10)
    name = max(
        (r.name for r in virt.fragments),
        key=lambda nm: virt.programs[nm].num_sim_qubits,
    )
    n = virt.programs[name].num_sim_qubits
    assert n >= 9
    rows_ref, pos_ref = make_chunk_kernel(virt, name, 4, interpret=True)
    built = make_blocked_chunk_kernel(
        virt, name, 4, window=8, interpret=True, force=True
    )
    assert built is not None
    rows_blk, pos_blk = built
    assert pos_ref == pos_blk
    lab = _rand_labels(virt, 4, seed=11)
    np.testing.assert_allclose(
        np.asarray(rows_blk(lab)), np.asarray(rows_ref(lab)), atol=1e-6
    )


def test_plan_segments_properties():
    """Every op lands in exactly one segment, in order; each segment's
    qubits map below the window; re-tiles only between segments."""
    virt = _cut("hwe", 16, 3, 10)
    name = virt.fragments[0].name
    _, suffix, prog = _plan_ops(virt, name)
    n = prog.num_sim_qubits
    for w in (8, 9):
        segs = plan_segments(suffix, n, w)
        flat_ops = [op for _, seg in segs for op in seg]
        assert flat_ops == suffix
        for perm, seg in segs:
            assert sorted(perm.values()) == list(range(n))
            for op in seg:
                assert all(perm[q] < w for q in op[2]), (op, perm)
        # real multi-segment coverage: the window is smaller than the
        # fragment, so at least one re-tile must happen
        assert len(segs) >= 2


def test_blocked_width_gate():
    virt = _cut("hwe", 16, 3, 10)
    name = virt.fragments[0].name
    # n = 11 is inside the VMEM kernel's range: without force the
    # blocked path must decline (the VMEM kernel owns 8..20)
    assert make_blocked_chunk_kernel(virt, name, 8, interpret=True) \
        is None
