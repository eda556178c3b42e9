"""Regression tests for the round-3 review/advisor findings."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    smolin_project,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.quasi_distr import (
    QuasiDistr,
)


def _smolin_loop(vals: np.ndarray) -> np.ndarray:
    """The reference's ascending scan (quasi_distr.py:28-43), kept here as
    the oracle for the vectorised projection."""
    vals = np.asarray(vals, dtype=np.float64)
    order = np.argsort(vals, kind="stable")
    out = np.zeros_like(vals)
    beta = 0.0
    num = len(vals)
    for i in order:
        temp = vals[i] + beta / num
        if temp < 0:
            beta += vals[i]
            num -= 1
        else:
            out[i] = vals[i] + beta / num
    return out


def test_smolin_project_matches_loop_random():
    rng = np.random.default_rng(7)
    for size in (1, 3, 64, 1000):
        for scale in (0.01, 0.3):
            v = rng.normal(1.0 / size, scale / size, size)
            v = v / v.sum()  # quasi-distribution with negativity
            got = smolin_project(v)
            want = _smolin_loop(v)
            np.testing.assert_allclose(got, want, atol=1e-12)
            assert (got >= 0).all()
            np.testing.assert_allclose(got.sum(), v.sum(), atol=1e-9)


def test_smolin_project_fast_paths():
    # all non-negative: identity
    v = np.array([0.25, 0.5, 0.25])
    np.testing.assert_array_equal(smolin_project(v), v)
    # heavy negativity forcing the full-sort fallback branch
    v = np.array([-1.0, -2.0, -3.0, 6.1])
    np.testing.assert_allclose(smolin_project(v), _smolin_loop(v), atol=1e-12)
    # everything negative -> all discarded
    v = np.array([-0.5, -0.5])
    np.testing.assert_array_equal(smolin_project(v), np.zeros(2))


def test_smolin_project_large_is_fast():
    """ghz-24-scale projection must not be a Python loop (VERDICT weak #2:
    <100 ms for 2^24 entries; allow slack for the 1-core CI box)."""
    import time

    n = 1 << 22
    v = np.full(n, 1.0 / n)
    rng = np.random.default_rng(0)
    idx = rng.choice(n, 2000, replace=False)
    v[idx] -= 3.0 / n  # sprinkle negativity
    # warm once (jit compile / allocator), then time the steady call —
    # the box is 1 CPU core and often co-loaded, so only the steady call
    # is meaningful
    smolin_project(v)
    t0 = time.perf_counter()
    out = smolin_project(v)
    dt = time.perf_counter() - t0
    assert (out >= 0).all()
    # generous bound: the pre-fix Python loop took >20s at this size,
    # the vectorised path ~50ms idle
    assert dt < 8.0, f"vectorised projection too slow: {dt:.2f}s"


def test_to_counts_reference_signature():
    """ADVICE r2: to_counts must match the reference API
    (quasi_distr.py:22-26): (num_clbits, shots), zfilled keys,
    int(abs(v*shots)) counts."""
    q = QuasiDistr.from_pairs({0: 0.5, 3: -0.25, 5: 0.75})
    counts = q.to_counts(4, 1000)
    assert counts == {"0000": 500, "0011": 250, "0101": 750}


def test_checkpoint_fingerprint_hashes_full_coef():
    """ADVICE r2: fingerprints must depend on full coefficient tables, not
    their (truncating) repr."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
        Instruction,
        Register,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.checkpoint import (
        checkpoint_fingerprint,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
        VirtualGateOp,
    )

    def make(theta):
        cut = Circuit([Register("frag0", 1), Register("frag1", 1)], 2)
        cut.h(0)
        cut.append(
            Instruction(
                "vgate", [0, 1], params=[theta],
                op=VirtualGateOp("rzz", (theta,)),
            )
        )
        cut.measure(0, 0)
        cut.measure(1, 1)
        return VirtualCircuit(cut)

    fp1 = checkpoint_fingerprint(make(0.3))
    fp2 = checkpoint_fingerprint(make(0.9))
    assert fp1 != fp2  # coef tables differ only in the RZZ angle terms


def test_checkpoint_fingerprint_distinguishes_gate_types():
    """cx/cy/cz share an identical coef table (conjugated-cz construction)
    but different endpoint unitaries — their fingerprints must differ, or a
    resumed run silently knits the wrong gate's fragment results."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
        Instruction,
        Register,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.checkpoint import (
        checkpoint_fingerprint,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
        VirtualGateOp,
    )

    def make(gate):
        cut = Circuit([Register("frag0", 1), Register("frag1", 1)], 2)
        cut.h(0)
        cut.append(Instruction("vgate", [0, 1], op=VirtualGateOp(gate)))
        cut.measure(0, 0)
        cut.measure(1, 1)
        return VirtualCircuit(cut)

    fps = {g: checkpoint_fingerprint(make(g)) for g in ("cx", "cy", "cz")}
    assert len(set(fps.values())) == 3, fps


def test_variant_index_table_convention():
    """variant_index_table pins the reference label order: last vgate in
    ``order`` varies fastest; padding labels clamp to the final real one."""
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        variant_index_table,
    )

    order = [0, 1]
    strides = {0: 3, 1: 1}      # vgate 1 fastest
    n_inst = {0: 2, 1: 3}
    t = variant_index_table(order, strides, n_inst, padded=8, clamp_to=6)
    np.testing.assert_array_equal(
        t[:, 0], [0, 0, 0, 1, 1, 1, 1, 1]   # label//3 % 2, clamped at 5
    )
    np.testing.assert_array_equal(
        t[:, 1], [0, 1, 2, 0, 1, 2, 2, 2]   # label % 3, clamped at 5
    )
    assert t.dtype == np.int32
    # empty order still yields one (unused) zero column
    t0 = variant_index_table([], {}, {}, padded=4)
    assert t0.shape == (4, 1) and not t0.any()


def test_reuse_pairs_skip_idle_qubits():
    """Regression: an idle qubit raised IndexError (not StopIteration)
    from is_dependent_qubit and crashed find_valid_reuse_pairs."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.dag import (
        DAG,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.qubit_reuser import (
        find_valid_reuse_pairs,
    )

    c = Circuit(3, 3)
    c.cx(0, 1)
    c.cx(1, 0)
    pairs = list(find_valid_reuse_pairs(DAG(c)))  # must not raise
    assert all(0 <= a < 3 and 0 <= b < 3 for a, b in pairs)


def test_qubit_reuser_preserves_backends():
    """Regression: QubitReuser.run re-inited the VirtualCircuit and
    silently dropped the user's set_backend mapping."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.passes import (
        OptimalDecompositionPass,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.compiler.qubit_reuser import (
        QubitReuser,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        default_noise_model,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = Circuit(4, 4)
    c.h(0)
    for i in range(3):
        c.cx(i, i + 1)
    for q in range(4):
        c.measure(q, q)
    cut = OptimalDecompositionPass(2).run(c, budget=5)
    virt = VirtualCircuit(cut)
    model = default_noise_model()
    virt.set_backend_for_all(model)
    QubitReuser(2).run(virt)
    assert virt._backends, "backend mapping lost across qubit reuse"
    assert all(b is model for b in virt._backends.values())


def test_cut_plan_json_teleport_optional():
    """Regression: from_json required the 'teleport' key even though the
    dataclass defaults it to False."""
    import json

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.plan import (
        CutPlan,
    )

    d = {
        "num_partitions": 2,
        "assignment": {"0": 0, "1": 1},
        "cuts": [{"edge": [0, 1], "kind": "gate"}],
        "metrics": {"S": 6, "A": 0, "L": 0, "Q": 2, "C": 1,
                    "Q_p": [1, 1], "C_p": [1, 1]},
    }
    plan = CutPlan.from_json(json.dumps(d))
    assert plan.cuts[0].teleport is False


def test_gate_matrices_write_protected():
    """Regression: gate_matrix returned shared mutable arrays — one
    in-place edit would corrupt the gate for the whole process."""
    import pytest

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.gates import (
        gate_matrix,
    )

    for name, params in [("cx", ()), ("h", ()), ("rz", (0.3,))]:
        m = gate_matrix(name, params)
        with pytest.raises(ValueError):
            m[0, 0] = 99.0


def test_read_circuit_rejects_3q_ops():
    """Regression: >2-qubit ops were silently dropped from the cut graph,
    leaving their operands unconstrained for the solver."""
    import pytest

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.graph import (
        read_circuit,
    )

    c = Circuit(3, 0)
    c.ccx(0, 1, 2)
    with pytest.raises(ValueError, match="decompose"):
        read_circuit(c)


def test_lightcone_marginal_unmeasured_kept_clbit():
    """Regression: a kept clbit with no measure raised ValueError instead
    of reading as the Distribution convention's implicit constant 0."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
        lightcone_marginal,
    )

    c = Circuit(3, 3)
    c.h(0)
    c.cx(0, 2)
    c.measure(0, 0)
    c.measure(2, 2)
    d = lightcone_marginal(c, {0, 1})  # clbit 1 never measured
    vals = np.asarray(d.values)
    assert vals[0] == pytest.approx(0.5, abs=1e-6)
    assert vals[1] == pytest.approx(0.5, abs=1e-6)
    assert vals[2] == vals[3] == 0.0  # bit for clbit 1 pinned to 0


def test_checkpoint_corrupt_manifest_returns_none(tmp_path):
    """Regression: a truncated manifest or missing fragment file crashed
    the resume path instead of falling back to re-simulation."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.checkpoint import (
        load_fragment_results,
    )

    (tmp_path / "fragment_results.json").write_text('{"fingerprint": "x"')
    assert load_fragment_results(tmp_path) is None
    (tmp_path / "fragment_results.json").write_text(
        '{"fingerprint": null, "fragments": '
        '[{"name": "f0", "file": "missing.npz"}]}'
    )
    assert load_fragment_results(tmp_path) is None


def test_gencirc_su_seed_reproducible():
    """Regression: the 'su' branch drew parameters from the unseeded
    global numpy RNG, breaking genCirc's documented seed contract."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )

    a = genCirc("su", 5, 1, seed=11)
    b = genCirc("su", 5, 1, seed=11)
    pa = [i.params for i in a.instructions if i.params]
    pb = [i.params for i in b.instructions if i.params]
    assert pa and pa == pb


def test_gencirc_unrealizable_clear_error():
    """Regression: unrealizable generator configs crashed with
    AttributeError on None instead of a clear ValueError."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )

    with pytest.raises(ValueError, match="cannot realize"):
        genCirc("sup", 14, 1, seed=1)
