"""Regression tests for the round-2 review findings."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def test_streamed_three_fragments():
    """Streamed einsum labels must not collide with the chunk label
    ('cc' used to become a silent diagonal for 3+ fragments)."""
    n = 6
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=3, maxNQubitsPerPartition=2,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    assert len(virt.fragments) >= 3
    for chunk in (4, 7):
        dist, _ = run_virtual_circuit(
            virt, engine="streamed", chunk_size=chunk, project=False
        )
        fid = hellinger_fidelity(simulate_circuit(circ), dist)
        assert fid > 1 - 1e-5, (chunk, fid)
        assert float(np.sum(np.asarray(dist.values))) == pytest.approx(
            1.0, abs=1e-4
        )


def test_lightcone_keeps_dephasing_measure():
    """A mid-circuit measurement of a non-kept clbit dephases its qubit
    and must stay in the lightcone."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
        lightcone_marginal,
    )

    circ = Circuit(1, 2)
    circ.h(0)
    circ.measure(0, 1)   # mid-circuit, non-kept
    circ.h(0)
    circ.measure(0, 0)
    got = lightcone_marginal(circ, {0})
    np.testing.assert_allclose(np.asarray(got.values), [0.5, 0.5], atol=1e-6)


def test_stale_checkpoint_triggers_resimulation(tmp_path):
    def cut(n):
        circ = Circuit(n, n)
        circ.h(0)
        for i in range(n - 1):
            circ.cx(i, i + 1)
        for q in range(n):
            circ.measure(q, q)
        cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=n - 1,
                        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
        assert cutter.solve()
        return circ, VirtualCircuit(cutter.getResultCircs()[3])

    ckpt = tmp_path / "ckpt"
    _, virt4 = cut(4)
    run_virtual_circuit(virt4, checkpoint_dir=ckpt)

    circ5, virt5 = cut(5)
    dist, _ = run_virtual_circuit(virt5, checkpoint_dir=ckpt, project=False)
    fid = hellinger_fidelity(simulate_circuit(circ5), dist)
    assert fid > 1 - 1e-5, fid


def test_reparameterised_checkpoint_not_resumed(tmp_path):
    """Same ansatz STRUCTURE, different parameters: the fingerprint must
    differ (gate matrices are hashed), so stale results are not knitted."""
    import numpy as np

    def cut(theta):
        circ = Circuit(4, 4)
        for q in range(4):
            circ.ry(theta, q)
        for i in range(3):
            circ.cx(i, i + 1)
        for q in range(4):
            circ.measure(q, q)
        cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
        assert cutter.solve()
        return circ, VirtualCircuit(cutter.getResultCircs()[3])

    ckpt = tmp_path / "ckpt"
    _, virt1 = cut(0.3)
    run_virtual_circuit(virt1, checkpoint_dir=ckpt)

    circ2, virt2 = cut(1.1)
    dist, _ = run_virtual_circuit(virt2, checkpoint_dir=ckpt, project=False)
    fid = hellinger_fidelity(simulate_circuit(circ2), dist)
    assert fid > 1 - 1e-5, fid


def test_unknown_engine_rejected():
    circ = Circuit(2, 2)
    circ.h(0)
    circ.cx(0, 1)
    circ.measure_all()
    cutter = Cutter(circ, maxNPartitions=1, maxNQubitsPerPartition=2)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    with pytest.raises(ValueError, match="unknown engine"):
        run_virtual_circuit(virt, engine="streamd")


def test_use_plan_rejects_mismatched_plan():
    def cutter_for(n):
        circ = Circuit(n, n)
        circ.h(0)
        for i in range(n - 1):
            circ.cx(i, i + 1)
        circ.measure_all()
        return Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=n - 1,
                      maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)

    small = cutter_for(4)
    assert small.solve()
    big = cutter_for(6)
    with pytest.raises(ValueError, match="vertices"):
        big.use_plan(small.plan)


def test_streamed_supports_checkpoint_dir(tmp_path):
    """r2 rejected checkpoint_dir on the streamed engine; r3 made the scan
    segmented+checkpointable (tests/test_streamed_full.py proves resume),
    so the run must now succeed and leave a carry checkpoint behind."""
    circ = Circuit(3, 3)
    circ.h(0)
    circ.cx(0, 1)
    circ.cx(1, 2)
    circ.measure_all()
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=2,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    dist, _ = run_virtual_circuit(
        virt, engine="streamed", chunk_size=4, checkpoint_dir=tmp_path
    )
    assert (tmp_path / "stream_carry.npz").exists()
    assert abs(float(dist.values.sum()) - 1.0) < 1e-4
