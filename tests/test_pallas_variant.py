"""Whole-variant-in-VMEM Pallas kernel (ops/pallas_variant.py) — exact
differential against the XLA batched engine, interpret mode on CPU (the
Mosaic path itself is TPU-only and opt-in; perf is probed by
benchmarks/pallas_variant_probe.py)."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    Instruction,
    Register,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (
    make_pallas_variant_fn,
    run_fragment_pallas_variant,
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


def _chain_cut(nbig: int):
    cut = Circuit([Register("frag0", nbig), Register("frag1", 2)],
                  nbig + 2)
    cut.h(0)
    for i in range(nbig - 1):
        cut.cx(i, i + 1)
    for q in range(nbig):
        cut.rz(0.1 * (q + 1), q)
    cut.append(Instruction("vgate", [nbig - 1, nbig],
                           op=VirtualGateOp("cz")))
    cut.append(Instruction("vgate", [0, nbig],
                           op=VirtualGateOp("cp", params=(0.7,))))
    cut.cx(nbig, nbig + 1)
    for q in range(nbig + 2):
        cut.measure(q, q)
    return VirtualCircuit(cut)


def test_chain_fragment_rows_exact():
    """Covers: fixed 1q/2q gates on lane and row bits, two slot kinds
    (measuring cz + parameterised cp), deferral ancillas."""
    virt = _chain_cut(8)
    got = run_fragment_pallas_variant(virt, "frag0", interpret=True)
    want = run_fragment(virt, "frag0")
    assert got.bit_positions == want.bit_positions
    np.testing.assert_allclose(
        np.asarray(got.values), np.asarray(want.values), atol=2e-6
    )


def test_sup12_fragment_rows_exact():
    """A real optimal-cut supremacy fragment (dense 2q structure, cz
    cuts on interior qubits)."""
    circ = genCirc("sup", 12, 1, seed=5)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=10,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    for reg in virt.fragments:
        got = run_fragment_pallas_variant(virt, reg.name, interpret=True)
        if got is None:
            continue  # below the kernel's 8-qubit floor
        want = run_fragment(virt, reg.name)
        np.testing.assert_allclose(
            np.asarray(got.values), np.asarray(want.values), atol=2e-6
        )


def test_width_gate():
    """Fragments outside [8, 19] sim qubits are declined, not wrong."""
    virt = _chain_cut(8)
    assert make_pallas_variant_fn(virt, "frag1", interpret=True) is None


def test_streamed_engine_with_pallas_rows_matches():
    """engine='pallas' route: the streamed scan with the VMEM kernel as
    the per-chunk row producer must equal the plain streamed scan."""
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    virt = _chain_cut(8)
    s1, xs1, _ = make_streamed_knit(virt, chunk=18)
    s2, xs2, _ = make_streamed_knit(virt, chunk=18, pallas_variant=True)
    a = np.asarray(jax.jit(s1)(xs1))
    b = np.asarray(jax.jit(s2)(xs2))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_run_virtual_circuit_engine_pallas():
    """The public engine='pallas' route (CPU: interpret mode) matches the
    default engine and the uncut oracle."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    circ = genCirc("ghz", 10, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                    maxNQpdCuts=2, maxNCuts=2)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    dist, _ = run_virtual_circuit(virt, engine="pallas", chunk_size=12)
    assert hellinger_fidelity(simulate_circuit(circ), dist) > 1 - 1e-6
