"""Streaming knit vs the batched engine: identical results, any chunking."""
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
    run_virtual_circuit_streamed,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_all_fragments,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(circ, cap, parts=2):
    cutter = Cutter(circ, maxNPartitions=parts, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _ghz(n):
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    return circ


def _mixed(n):
    rng = np.random.default_rng(5)
    circ = Circuit(n, n)
    for q in range(n):
        circ.ry(float(rng.standard_normal()), q)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.cz(0, n - 1)
    circ.rzz(0.7, 1, n - 2)
    for q in range(n):
        circ.measure(q, q)
    return circ


@pytest.mark.parametrize("chunk", [1, 3, 7, 64])
def test_streamed_matches_batched_ghz(chunk):
    virt = _cut(_ghz(5), 3)
    batched = knit(virt, run_all_fragments(virt))
    streamed = run_virtual_circuit_streamed(virt, chunk=chunk)
    assert streamed.bit_positions == batched.bit_positions
    np.testing.assert_allclose(
        np.asarray(streamed.values), np.asarray(batched.values), atol=2e-6
    )


def test_streamed_multi_cut_fidelity():
    circ = _mixed(6)
    virt = _cut(circ, 4)
    streamed = run_virtual_circuit_streamed(virt, chunk=32)
    ideal = simulate_circuit(circ)
    fid = hellinger_fidelity(ideal, streamed)
    assert fid > 1 - 1e-5, fid


def test_streamed_no_cuts():
    circ = _ghz(4)
    virt = _cut(circ, 4, parts=1)
    streamed = run_virtual_circuit_streamed(virt, chunk=8)
    ideal = simulate_circuit(circ)
    assert hellinger_fidelity(ideal, streamed) > 1 - 1e-6


def test_streamed_xs_payload_scales_with_indices_only():
    """The scan xs must carry only per-label int32 variant indices, the
    validity mask, and (empty here) Pauli index blocks — NOT gathered
    slot matrices.  Guards the on-device-gather design: host memory and
    host->device traffic stay at O(labels x vgates x 4 B)."""
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    virt = _cut(_mixed(6), 4)
    num_g = len(virt.vgates)
    assert num_g >= 2
    _, xs, meta = make_streamed_knit(virt, chunk=16)
    padded = meta["n_chunks"] * meta["chunk"]
    leaves = jax.tree.leaves(xs)
    nbytes = sum(np.asarray(a).nbytes for a in leaves)
    # indices [padded, G] int32 + valid [padded] f32 + empty pauli blocks
    assert nbytes <= padded * (4 * num_g + 4) + 64, (
        f"xs payload {nbytes} B — gathered matrices leaked back into xs?"
    )


def test_auto_engine_switches_to_streamed_above_label_cap(monkeypatch):
    """engine="auto" must route sup-25/aqft-16-class global fan-outs to
    the constant-memory scan instead of the batched path."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu import run as run_mod

    virt = _cut(_mixed(6), 4)
    labels = 1
    for vg in virt.vgates:
        labels *= vg.spec.num_instantiations
    assert labels > 1

    monkeypatch.setattr(run_mod, "AUTO_STREAM_LABELS", labels - 1)
    dist, info = run_mod.run_virtual_circuit(virt, engine="auto")
    # streamed signature: sim+knit fused, knit phase collapsed to 0
    assert info.knit_time == 0.0
    fid = hellinger_fidelity(simulate_circuit(_mixed(6)), dist)
    assert fid > 1 - 1e-5

    monkeypatch.setattr(run_mod, "AUTO_STREAM_LABELS", labels + 1)
    dist2, info2 = run_mod.run_virtual_circuit(virt, engine="auto")
    assert info2.knit_time > 0.0
    np.testing.assert_allclose(
        np.asarray(dist2.values), np.asarray(dist.values), atol=2e-6
    )
