"""Streamed engine full-service tests: shots, checkpoint/resume, noise.

(Reference parity target: qvm/run.py:24-42 — everything runs shot-sampled
on noisy backends; r2 VERDICT item 3.)
"""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    Instruction,
    Register,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
    make_streamed_knit,
    run_virtual_circuit_streamed,
    _save_stream_checkpoint,
    _stream_fingerprint,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
    VirtualGateOp,
)


def _two_cut_circuit():
    """4-qubit chain with two gate cuts -> 36 global labels (multi-chunk
    at chunk=8)."""
    n = 4
    orig = Circuit(n, n)
    orig.h(0)
    orig.cx(0, 1)
    orig.cz(1, 2)
    orig.cx(2, 3)
    orig.cz(0, 1)
    for q in range(n):
        orig.measure(q, q)

    cut = Circuit([Register("frag0", 2), Register("frag1", 2)], n)
    cut.h(0)
    cut.cx(0, 1)
    cut.append(Instruction("vgate", [1, 2], op=VirtualGateOp("cz")))
    cut.cx(2, 3)
    cut.cz(0, 1)
    for q in range(n):
        cut.measure(q, q)
    return orig, VirtualCircuit(cut)


def _wide_cut_circuit():
    """Two cuts so the global label space is 36 (cz x cz)."""
    n = 6
    orig = Circuit(n, n)
    orig.h(0)
    for i in range(n - 1):
        orig.cx(i, i + 1) if i % 2 == 0 else orig.cz(i, i + 1)
    for q in range(n):
        orig.measure(q, q)

    cut = Circuit(
        [Register("frag0", 2), Register("frag1", 2), Register("frag2", 2)], n
    )
    cut.h(0)
    cut.cx(0, 1)
    cut.append(Instruction("vgate", [1, 2], op=VirtualGateOp("cz")))
    cut.cx(2, 3)
    cut.append(Instruction("vgate", [3, 4], op=VirtualGateOp("cz")))
    cut.cx(4, 5)
    for q in range(n):
        cut.measure(q, q)
    return orig, VirtualCircuit(cut)


def test_streamed_shots():
    orig, virt = _two_cut_circuit()
    ideal = simulate_circuit(orig)
    dist, _ = run_virtual_circuit(
        virt, engine="streamed", shots=20000, chunk_size=8, seed=3
    )
    vals = np.asarray(dist.values)
    assert (vals >= 0).all()
    assert vals.sum() == pytest.approx(1.0, abs=1e-6)
    # 20k shots: fidelity high but not exactly 1
    assert hellinger_fidelity(ideal, dist) > 0.995


def test_streamed_checkpoint_resume(tmp_path):
    orig, virt = _wide_cut_circuit()
    want = run_virtual_circuit_streamed(virt, chunk=8, project=False)

    ckpt = tmp_path / "stream"
    got = run_virtual_circuit_streamed(
        virt, chunk=8, project=False,
        checkpoint_dir=ckpt, segment_chunks=2,
    )
    np.testing.assert_allclose(got.values, want.values, atol=1e-6)
    assert (ckpt / "stream_carry.npz").exists()

    # prove resume USES the saved carry: plant a completed checkpoint with
    # a doubled accumulator — if segments re-ran, the output would be the
    # true values, not 2x.
    import math

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        _resolve_noise,
        auto_chunk,
    )

    chunk = auto_chunk(virt, 8)
    _, _, meta = make_streamed_knit(virt, chunk)
    seg = 2
    nseg = math.ceil(meta["n_chunks"] / seg)
    fp = _stream_fingerprint(
        virt, chunk, seg, _resolve_noise(virt, None), None, 0
    )
    # build the real carry by replaying the segment fn, then double it
    import jax

    step_fn, xs, meta2 = make_streamed_knit(virt, chunk)
    carry = np.zeros(meta2["carry_shape"], np.float32)
    carry = np.asarray(jax.jit(meta2["segment_fn"])(carry, xs))
    _save_stream_checkpoint(ckpt, fp, carry * 2.0, nseg)
    doubled = run_virtual_circuit_streamed(
        virt, chunk=8, project=False,
        checkpoint_dir=ckpt, segment_chunks=seg,
    )
    np.testing.assert_allclose(
        doubled.values, 2.0 * np.asarray(want.values), atol=1e-5
    )

    # stale fingerprint -> ignored, recomputed correctly
    _save_stream_checkpoint(ckpt, "not-the-fingerprint", carry * 2.0, nseg)
    clean = run_virtual_circuit_streamed(
        virt, chunk=8, project=False,
        checkpoint_dir=ckpt, segment_chunks=seg,
    )
    np.testing.assert_allclose(clean.values, want.values, atol=1e-6)


def test_streamed_noisy_readout_only_matches_batched():
    """With p1=p2=0 every trajectory is the identity, so the streamed noisy
    path must equal the batched noisy path exactly (readout is exact in
    both)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_noisy_virtual_circuit,
    )

    orig, virt = _two_cut_circuit()
    nm = NoiseModel("readout_only", p1=0.0, p2=0.0,
                    readout01=0.02, readout10=0.05, trajectories=2)
    want, _ = run_noisy_virtual_circuit(virt, nm, seed=5)
    got, _ = run_noisy_virtual_circuit(
        virt, nm, seed=5, engine="streamed", chunk_size=8
    )
    assert got.bit_positions == want.bit_positions
    np.testing.assert_allclose(
        np.asarray(got.values), np.asarray(want.values), atol=2e-5
    )


def test_streamed_noisy_shots_end_to_end():
    """Depolarising + readout + shots through the streamed scan: the
    sup-20-class serving mode at test scale."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_noisy_virtual_circuit,
    )

    orig, virt = _wide_cut_circuit()
    ideal = simulate_circuit(orig)
    nm = NoiseModel("test", p1=0.002, p2=0.02,
                    readout01=0.02, readout10=0.04, trajectories=4)
    dist, info = run_noisy_virtual_circuit(
        virt, nm, shots=4000, seed=11, engine="streamed", chunk_size=8
    )
    vals = np.asarray(dist.values)
    assert (vals >= 0).all()
    assert vals.sum() == pytest.approx(1.0, abs=1e-6)
    fid = hellinger_fidelity(ideal, dist)
    assert 0.5 < fid < 0.9999, fid  # noisy: clearly below the exact oracle
