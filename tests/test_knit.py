"""Knit identity tests: for every virtualizable gate type, a manually cut
circuit's knitted distribution must equal the uncut circuit's exact
distribution (the reference's cutVsUncutFidelity == 1 oracle, SURVEY §4)."""
import math

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    Instruction,
    Register,
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
    VirtualGateOp,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)


def vgate(name, qubits, params=()):
    return Instruction(
        "vgate", list(qubits), params=list(params),
        op=VirtualGateOp(name, tuple(params)),
    )


def assert_dist_close(d1, d2, tol=2e-5):
    keys = set(d1.to_dict(1e-7)) | set(d2.to_dict(1e-7))
    a = d1.to_dict()
    b = d2.to_dict()
    for k in keys:
        assert a.get(k, 0.0) == pytest.approx(b.get(k, 0.0), abs=tol), (
            k, a.get(k), b.get(k)
        )


@pytest.mark.parametrize(
    "name,params",
    [
        ("cz", ()),
        ("cx", ()),
        ("cy", ()),
        ("rzz", (0.77,)),
        ("rzz", (math.pi,)),   # near-Clifford special case
        ("rzz", (0.0,)),       # sin==0 special case
        ("cp", (1.3,)),
        ("cp", (-2.0,)),
    ],
)
def test_gate_cut_identity(name, params):
    # uncut: 2 qubits with context before and after the cut gate
    orig = Circuit(2, 2)
    orig.h(0)
    orig.ry(0.4, 1)
    getattr(orig, name)(*params, 0, 1) if params else getattr(orig, name)(0, 1)
    orig.rx(0.7, 0)
    orig.h(1)
    orig.measure(0, 0)
    orig.measure(1, 1)
    ideal = simulate_circuit(orig)

    cut = Circuit([Register("frag0", 1), Register("frag1", 1)], 2)
    cut.h(0)
    cut.ry(0.4, 1)
    cut.append(vgate(name, [0, 1], params))
    cut.rx(0.7, 0)
    cut.h(1)
    cut.measure(0, 0)
    cut.measure(1, 1)
    knitted, _ = run_virtual_circuit(VirtualCircuit(cut), project=False)
    assert_dist_close(ideal, knitted)


def test_wire_cut_identity_ghz3():
    orig = Circuit(3, 3)
    orig.h(0)
    orig.cx(0, 1)
    orig.cx(1, 2)
    for q in range(3):
        orig.measure(q, q)
    ideal = simulate_circuit(orig)

    # frag0 = [q0, q1]; frag1 = [vmove, q2]
    cut = Circuit([Register("frag0", 2), Register("frag1", 2)], 3)
    cut.h(0)
    cut.cx(0, 1)
    cut.append(vgate("move", [1, 2]))
    cut.cx(2, 3)
    cut.measure(0, 0)
    cut.measure(2, 1)
    cut.measure(3, 2)
    knitted, _ = run_virtual_circuit(VirtualCircuit(cut), project=False)
    assert_dist_close(ideal, knitted)
    assert hellinger_fidelity(ideal, knitted) == pytest.approx(1.0, abs=1e-5)


def test_wire_and_gate_cut_combined():
    # 3-qubit circuit with one gate cut and one wire cut (3 fragments worth
    # of variant structure in 2 fragments)
    orig = Circuit(3, 3)
    orig.h(0)
    orig.ry(0.3, 1)
    orig.h(2)
    orig.cz(0, 1)
    orig.cx(1, 2)
    orig.rx(0.5, 2)
    for q in range(3):
        orig.measure(q, q)
    ideal = simulate_circuit(orig)

    # cut the cz(0,1) as a gate cut, and the wire q1 between cz and cx as a
    # wire cut. frag0 = [q0], frag1 = [q1... wait q1 stays with frag0's cz?
    # layout: frag0=[q0, q1], frag1=[vmove, q2]; gate cut between q0 and q1
    # is intra-fragment (allowed: both endpoints in one fragment), wire cut
    # moves q1 to vmove in frag1.
    cut = Circuit([Register("frag0", 2), Register("frag1", 2)], 3)
    cut.h(0)
    cut.ry(0.3, 1)
    cut.h(3)
    cut.append(vgate("cz", [0, 1]))
    cut.append(vgate("move", [1, 2]))
    cut.cx(2, 3)
    cut.rx(0.5, 3)
    cut.measure(0, 0)
    cut.measure(2, 1)
    cut.measure(3, 2)
    knitted, _ = run_virtual_circuit(VirtualCircuit(cut), project=False)
    assert_dist_close(ideal, knitted)


def test_sampled_path_statistical():
    orig = Circuit(2, 2)
    orig.h(0)
    orig.cz(0, 1)
    orig.h(1)
    orig.measure(0, 0)
    orig.measure(1, 1)
    ideal = simulate_circuit(orig)

    cut = Circuit([Register("frag0", 1), Register("frag1", 1)], 2)
    cut.h(0)
    cut.append(vgate("cz", [0, 1]))
    cut.h(1)
    cut.measure(0, 0)
    cut.measure(1, 1)
    knitted, _ = run_virtual_circuit(
        VirtualCircuit(cut), shots=20000, seed=3, project=True
    )
    assert hellinger_fidelity(ideal, knitted) > 0.995


def test_prune_distribution_reference_accuracy():
    """Reference-compatible pruning (quasi_distr.py:3,8-10): |v| <= 1e-5
    zeroed, larger entries untouched, sign preserved."""
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
        prune_distribution,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        Distribution,
    )

    vals = np.array([0.5, 1e-5, -1e-5, 2e-5, -2e-5, 0.0, 1e-6, -0.4],
                    dtype=np.float64)
    d = prune_distribution(Distribution(vals, [0, 1, 2], 3))
    np.testing.assert_allclose(
        np.asarray(d.values),
        [0.5, 0.0, 0.0, 2e-5, -2e-5, 0.0, 0.0, -0.4],
    )
    assert d.bit_positions == [0, 1, 2] and d.num_clbits == 3


def test_scan_variant_rows_padding_edge():
    """scan_variant_rows pads to a chunk multiple by repeating the last
    row and slices the padding back off — totals not divisible by the
    chunk must round-trip exactly (incl. the n_chunks==1 shortcut)."""
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        scan_variant_rows,
    )

    mats = np.arange(7, dtype=np.float32).reshape(7, 1)

    def sim(m):
        import jax.numpy as jnp

        return jnp.stack([m[0], m[0] * 10.0])

    for chunk in (2, 3, 7, 16):  # 16 > total exercises the n_chunks==1 pad
        rows = scan_variant_rows(sim, (mats,), 7, chunk)
        np.testing.assert_allclose(rows[:, 0], np.arange(7))
        np.testing.assert_allclose(rows[:, 1], np.arange(7) * 10.0)
        assert rows.shape == (7, 2)


def test_blocked_knit_matches_knit_values():
    """knit_scalars_blocked + make_blocked_knit (the bounded-buffer knit
    used by bench_impl on the tunneled TPU) must agree exactly with
    knit_values for a mixed gate+wire cut set, at any block budget."""
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.bits import (
        permute_bits_flat_np,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
        knit_scalars_blocked,
        knit_values,
        make_blocked_knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        run_all_fragments,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = Circuit(6, 6)
    c.h(0)
    for i in range(5):
        c.cx(i, i + 1)
    c.cz(0, 5)
    for q in range(6):
        c.measure(q, q)
    cut = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=4,
                 maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cut.solve()
    virt = VirtualCircuit(cut.getResultCircs()[3])
    res = run_all_fragments(virt)
    ref, positions = knit_values(virt, res)
    ref = np.asarray(ref)

    for max_elems in (8, 32, 1 << 20):
        tot, neg = jax.jit(
            lambda me=max_elems: knit_scalars_blocked(virt, res, me)
        )()
        assert abs(float(tot) - ref.sum()) < 1e-5
        assert abs(float(neg) - np.minimum(ref, 0).sum()) < 1e-5

        block_fn, nb, bc, src_bits = make_blocked_knit(virt, res, max_elems)
        bf = jax.jit(block_fn)
        merged = np.concatenate(
            [np.asarray(bf(j)) for j in range(nb)], axis=1
        ).reshape(-1)
        flat = permute_bits_flat_np(merged, src_bits, sorted(src_bits))
        assert sorted(src_bits) == positions
        np.testing.assert_allclose(flat, ref, atol=1e-6)


def test_lazy_introduction_idle_and_late_qubits():
    """Lazy qubit introduction edge cases: a measured qubit with NO gates
    (deterministic |0> — spliced in as a zero bit after the marginal) and
    a qubit whose first gate comes after the cut slot."""
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
        simulate_circuit_host,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    circ = Circuit(6, 6)
    circ.h(0)
    for i in range(3):
        circ.cx(i, i + 1)
    # qubit 4: first gate AFTER the entangling chain (late introduction)
    circ.x(4)
    circ.cx(3, 4)
    # qubit 5: never touched — measured deterministic |0>
    for q in range(6):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    for engine in ("xla", "streamed"):
        dist, _ = run_virtual_circuit(virt, engine=engine)
        fid = hellinger_fidelity(simulate_circuit_host(circ), dist)
        assert fid > 1 - 1e-5, (engine, fid)


def test_gate_width_count_bounded_by_slots():
    """Lazy-introduction coalescing: the number of DISTINCT state widths
    at which gate ops run must be bounded by #slot-ops + 1 (per-op growth
    ballooned tunneled-TPU compile time; ancillas must still arrive at
    their slot, not at program start)."""
    import inspect

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        make_sim_fn,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    circ = genCirc("ghz", 12, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=7,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    for reg in virt.fragments:
        sim_one, _, _, _ = make_sim_fn(virt, reg.name, build_matrices=False)
        cl = inspect.getclosurevars(sim_one).nonlocals
        m, run_plan = cl["m0"], cl["run_plan"]
        gate_widths = set()
        n_slot_ops = 0
        for stp in run_plan:
            if stp[0] == "ins":
                m += 1
            else:
                gate_widths.add(m)
                if stp[0].startswith("slot"):
                    n_slot_ops += 1
        assert len(gate_widths) <= n_slot_ops + 1, (
            reg.name, sorted(gate_widths), n_slot_ops,
        )
        # and laziness is real: the prefix runs below the full width
        prog = virt.programs[reg.name]
        if prog.slots:
            assert cl["m0"] < prog.num_sim_qubits or not run_plan
