"""Sharded-fragment engine (variant x amplitude co-sharding) differentials.

Subprocess-based: the virtual multi-device CPU platform must be configured
before JAX backend init (see tests/test_multichip.py).  The small case runs
in-process on a 1-device mesh (dp=1, amp=1) to cover the shard_map plumbing
cheaply; the big differential builds a >=16-qubit fragment and checks the
co-sharded rows against the single-device batched engine.
"""
import textwrap

import numpy as np
import pytest

from conftest import run_cpu_subprocess


def _run_in_subprocess(code: str, n_devices: int) -> str:
    return run_cpu_subprocess(code, n_devices, timeout=900)


def _cut_chain_code(n_qubits: int, q_cap: int) -> str:
    """Code fragment building an n-qubit CX chain cut at capacity q_cap."""
    return textwrap.dedent(
        f"""
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import Cutter
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import VirtualCircuit

        n = {n_qubits}
        circ = Circuit(n, n)
        circ.h(0)
        for i in range(n - 1):
            circ.cx(i, i + 1)
        for q in range(n):
            circ.rz(0.1 * (q + 1), q)
        for q in range(n):
            circ.measure(q, q)
        cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition={q_cap},
                        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
        assert cutter.solve()
        _, _, _, cut_circ, _ = cutter.getResultCircs()
        virt = VirtualCircuit(cut_circ)
        orig = circ
        """
    )


@pytest.mark.slow
def test_sharded_fragment_differential_16q():
    """>=16 sim qubits in the big fragment (hand-built cut: the optimal
    cutter balances partitions, so force an asymmetric 16+2 split),
    co-sharded dp=2 x amp=4 over 8 virtual devices; rows must match the
    single-device batched engine."""
    code = textwrap.dedent(
        """
        import numpy as np, jax
        from jax.sharding import Mesh
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit, Instruction, Register
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import VirtualCircuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import VirtualGateOp
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import run_fragment
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sharded_fragment import run_fragment_sharded

        nbig = 16
        cut = Circuit([Register("frag0", nbig), Register("frag1", 2)], nbig + 2)
        cut.h(0)
        for i in range(nbig - 1):
            cut.cx(i, i + 1)
        for q in range(nbig):
            cut.rz(0.1 * (q + 1), q)
        cut.append(Instruction("vgate", [nbig - 1, nbig], op=VirtualGateOp("cz")))
        cut.cx(nbig, nbig + 1)
        for q in range(nbig + 2):
            cut.measure(q, q)
        virt = VirtualCircuit(cut)
        nsim = virt.programs["frag0"].num_sim_qubits
        assert nsim >= 16, f"fragment only {nsim} sim qubits"
        mesh = Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "amp"))
        got = run_fragment_sharded(virt, "frag0", mesh)
        want = run_fragment(virt, "frag0")
        assert got.bit_positions == want.bit_positions
        assert got.touching == want.touching
        err = float(np.max(np.abs(got.values - want.values)))
        assert err < 1e-5, f"sharded fragment rows differ: {err}"
        print("sharded16 OK", nsim, got.values.shape, err)
        """
    )
    out = _run_in_subprocess(code, 8)
    assert "sharded16 OK" in out


@pytest.mark.slow
def test_sharded_engine_end_to_end():
    """engine='sharded' through run_virtual_circuit with per-fragment
    auto-meshes (max_local_qubits forces real amplitude sharding), knitted
    distribution vs uncut oracle."""
    code = _cut_chain_code(8, 5) + textwrap.dedent(
        """
        import numpy as np
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import run_virtual_circuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import simulate_circuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import hellinger_fidelity

        # every fragment (max 6 sim qubits) must shard: cap devices at 4 amps
        biggest = max(p.num_sim_qubits for p in virt.programs.values())
        cap = biggest - 2
        knitted, _ = run_virtual_circuit(
            virt, engine="sharded", max_local_qubits=cap
        )
        ideal = simulate_circuit(orig)
        fid = hellinger_fidelity(ideal, knitted)
        assert fid > 1 - 1e-5, fid
        print("shardedE2E OK", biggest, cap, fid)
        """
    )
    out = _run_in_subprocess(code, 8)
    assert "shardedE2E OK" in out


def test_sharded_fragment_single_device():
    """dp=1, amp=1 degenerate mesh must reproduce the batched engine
    (covers the shard_map plumbing without a multi-device platform)."""
    import jax
    from jax.sharding import Mesh

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
        Instruction,
        Register,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sharded_fragment import (
        run_fragment_sharded,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        run_fragment,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
        VirtualGateOp,
    )

    cut = Circuit([Register("frag0", 2), Register("frag1", 2)], 4)
    cut.h(0)
    cut.cx(0, 1)
    cut.append(Instruction("vgate", [1, 2], op=VirtualGateOp("cz")))
    cut.cx(2, 3)
    for q in range(4):
        cut.measure(q, q)
    virt = VirtualCircuit(cut)
    mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("dp", "amp"))
    for reg in virt.fragments:
        got = run_fragment_sharded(virt, reg.name, mesh)
        want = run_fragment(virt, reg.name)
        np.testing.assert_allclose(got.values, want.values, atol=1e-6)
        assert got.bit_positions == want.bit_positions
