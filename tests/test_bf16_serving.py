"""Quantized (bfloat16) serving mode of the streamed engine.

``dtype=jnp.bfloat16`` stores the statevector (and ancestor banks) in
bf16 — half the HBM bytes per pass on the bandwidth-bound serving step —
while gate constants follow the state dtype and probabilities, folds and
the knit accumulate in f32.  The contract: per-amplitude rounding is
~2^-8 per pass, so the knitted distribution must sit within a small
total-variation of the f32 result — far below finite-shot noise, which
is the regime this mode serves (the reference runs everything at
20000 shots, qvm/run.py:24).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
    make_streamed_knit,
    run_virtual_circuit_streamed,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(circ, cap, parts=2):
    cutter = Cutter(circ, maxNPartitions=parts, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


CONFIGS = [
    ("hwe", 8, 2, 5),   # multiple gate cuts
    ("aqft", 6, 2, 5),  # gate + wire cuts
    ("add", 6, 1, 5),   # wire cuts + deferral ancillas
]


@pytest.mark.parametrize("name,n,depth,cap", CONFIGS)
def test_bf16_close_to_f32(name, n, depth, cap):
    virt = _cut(genCirc(name, n, depth), cap)
    f32 = run_virtual_circuit_streamed(virt, chunk=32)
    b16 = run_virtual_circuit_streamed(virt, chunk=32, dtype=jnp.bfloat16)
    assert b16.bit_positions == f32.bit_positions
    tv = 0.5 * float(
        np.abs(np.asarray(f32.values) - np.asarray(b16.values)).sum()
    )
    assert tv < 5e-3, tv  # far below 20k-shot sampling noise
    # the knitted output itself stays f32 (only the state storage is bf16)
    assert np.asarray(b16.values).dtype == np.float32


def test_bf16_banks_and_shots():
    virt = _cut(genCirc("hwe", 8, 2), 5)
    step, xs, meta = make_streamed_knit(
        virt, 32, share_prefix=True, hoist_banks=True, dtype=jnp.bfloat16
    )
    assert meta["bank_fn"] is not None
    banks = jax.jit(meta["bank_fn"])()
    for leaf in jax.tree.leaves(banks):
        if leaf.size:
            assert leaf.dtype == jnp.bfloat16  # half the bank bytes
    got = np.asarray(jax.jit(step)(xs, banks))
    f32 = run_virtual_circuit_streamed(virt, chunk=32)
    assert np.abs(got - np.asarray(f32.values)).max() < 5e-3

    # finite-shot serving: same draws as f32 up to the rounding-induced
    # distribution shift — just assert a valid sample comes back
    shot = run_virtual_circuit_streamed(
        virt, chunk=32, shots=2000, dtype=jnp.bfloat16
    )
    assert abs(float(np.asarray(shot.values).sum()) - 1.0) < 1e-5


def test_bf16_rejects_noise():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
    )

    virt = _cut(genCirc("hwe", 8, 2), 5)
    with pytest.raises(AssertionError):
        make_streamed_knit(
            virt, 32, noise=NoiseModel(), dtype=jnp.bfloat16
        )


def test_bf16_sharded_fragment_close_to_f32():
    """bf16 on the co-sharded (dp x amp) engine: ppermute exchanges and
    local blocks at half the bytes; marginals accumulate f32.  Values
    must sit within bf16 rounding of the f32 run (4 virtual devices)."""
    import textwrap

    from conftest import run_cpu_subprocess

    code = textwrap.dedent(
        """
        import numpy as np, jax, jax.numpy as jnp
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import Cutter
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import VirtualCircuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sharded_fragment import (
            fragment_mesh, run_fragment_sharded,
        )

        n = 8
        circ = Circuit(n, n)
        circ.h(0)
        for i in range(n - 1):
            circ.cx(i, i + 1)
        for q in range(n):
            circ.rz(0.1 * (q + 1), q)
        for q in range(n):
            circ.measure(q, q)
        cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
        assert cutter.solve()
        virt = VirtualCircuit(cutter.getResultCircs()[3])
        name = virt.fragments[0].name
        nq = virt.programs[name].num_sim_qubits
        mesh = fragment_mesh(nq, max_local_qubits=nq - 1,
                             devices=jax.devices()[:4])
        assert mesh.shape["amp"] >= 2  # the amp axis really engages
        f32 = run_fragment_sharded(virt, name, mesh)
        b16 = run_fragment_sharded(virt, name, mesh, dtype=jnp.bfloat16)
        err = np.abs(f32.values - b16.values).max()
        assert err < 5e-3, err
        print("SHARDED_BF16_OK", err)
        """
    )
    out = run_cpu_subprocess(code, 4, timeout=900)
    assert "SHARDED_BF16_OK" in out


def test_bf16_checkpoints_do_not_cross_resume(tmp_path):
    """A bf16 run's checkpoint must never be resumed by an f32 run (or
    vice versa): the storage dtype is part of the checkpoint identity —
    otherwise a bf16-rounded partial carry would silently contaminate
    the exact-parity contract."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.checkpoint import (
        checkpoint_fingerprint,
    )

    virt = _cut(genCirc("hwe", 8, 2), 5)
    assert checkpoint_fingerprint(virt) == checkpoint_fingerprint(
        virt, dtype=jnp.float32
    )
    assert checkpoint_fingerprint(virt) != checkpoint_fingerprint(
        virt, dtype=jnp.bfloat16
    )

    # end-to-end: interleave checkpointed bf16 and f32 runs in one dir;
    # each must produce its own result, not the other's carry
    d = tmp_path / "ck"
    b16 = run_virtual_circuit_streamed(
        virt, chunk=8, checkpoint_dir=d, segment_chunks=2,
        dtype=jnp.bfloat16,
    )
    f32 = run_virtual_circuit_streamed(
        virt, chunk=8, checkpoint_dir=d, segment_chunks=2,
    )
    want = run_virtual_circuit_streamed(virt, chunk=8)
    np.testing.assert_allclose(
        np.asarray(f32.values), np.asarray(want.values), atol=1e-6
    )
    tv = 0.5 * float(
        np.abs(np.asarray(b16.values) - np.asarray(want.values)).sum()
    )
    assert tv < 5e-3


def test_bf16_sampled_engine_close_to_f32():
    """bf16 on the Monte-Carlo QPD sampling engine: identical label
    draws (sampling happens on host), sim at half the bytes; the
    estimate must sit within bf16 rounding of the f32 estimate."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_knit,
    )

    virt = _cut(genCirc("hwe", 8, 2), 5)
    f32 = sampled_knit(virt, 2000, seed=7)
    b16 = sampled_knit(virt, 2000, seed=7, dtype=jnp.bfloat16)
    assert b16.bit_positions == f32.bit_positions
    err = np.abs(np.asarray(f32.values) - np.asarray(b16.values)).max()
    assert err < 5e-3, err


def test_default_bank_budget_scales_with_dtype():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        default_bank_budget,
    )

    assert default_bank_budget() == 512 << 20
    assert default_bank_budget(jnp.float32) == 512 << 20
    assert default_bank_budget(jnp.bfloat16) == 1024 << 20


def test_bf16_dp_tp_knit_step_close_to_f32():
    """bf16 on the dp x tp knit step (parallel/sharded.py) on a 1-device
    mesh: the step must stay within bf16 rounding of f32."""
    from jax.sharding import Mesh

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.parallel.sharded import (
        make_sharded_step,
    )

    virt = _cut(genCirc("hwe", 8, 2), 5)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "tp"))
    outs = {}
    for key, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        step, args, shardings, _pos = make_sharded_step(virt, mesh, dtype=dt)
        jitted = jax.jit(step, in_shardings=shardings)
        outs[key] = np.asarray(jitted(*[
            jax.device_put(a, s) for a, s in zip(args, shardings)
        ]))
    assert np.abs(outs["bf16"] - outs["f32"]).max() < 5e-3
