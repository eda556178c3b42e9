"""Marginal knit: knitting onto a clbit subset equals marginalising the
full knitted distribution (exactness of the commuting-marginal identity)."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
    make_streamed_knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_all_fragments,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut_circuit(n=6, cap=4):
    rng = np.random.default_rng(11)
    circ = Circuit(n, n)
    for q in range(n):
        circ.ry(float(rng.standard_normal()), q)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.cz(0, n - 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _marginalize_full(values, all_positions, keep):
    """Host reference: brute-force sum of the full distribution onto the
    kept bits (little-endian, keep[0] as LSB)."""
    full = np.asarray(values, dtype=np.float64).reshape(-1)
    flat = np.zeros(1 << len(keep))
    for i in range(full.size):
        key = 0
        for j, p in enumerate(keep):
            bit = (i >> all_positions.index(p)) & 1
            key |= bit << j
        flat[key] += full[i]
    return flat


@pytest.mark.parametrize("keep", [[0, 1], [2, 5], [0, 3, 4]])
def test_marginal_knit_matches_full(keep):
    virt = _cut_circuit()
    results = run_all_fragments(virt)
    full = knit(virt, results)
    marg = knit(virt, results, keep_clbits=set(keep))
    assert marg.bit_positions == sorted(keep)
    want = _marginalize_full(full.values, full.bit_positions, sorted(keep))
    np.testing.assert_allclose(
        np.asarray(marg.values, dtype=np.float64), want, atol=2e-6
    )


def test_marginal_streamed_matches_batched():
    import jax

    virt = _cut_circuit()
    keep = {1, 4}
    results = run_all_fragments(virt)
    batched = knit(virt, results, keep_clbits=keep)
    step, xs, meta = make_streamed_knit(virt, chunk=16, keep_clbits=keep)
    assert meta["positions"] == sorted(keep)
    streamed = np.asarray(jax.jit(step)(xs))
    np.testing.assert_allclose(
        streamed, np.asarray(batched.values), atol=2e-6
    )


def test_run_virtual_circuit_keep_clbits_all_engines(tmp_path):
    """keep_clbits is a first-class run_virtual_circuit knob on every
    engine; each engine's marginal must equal the marginalised full
    knit."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    virt = _cut_circuit()
    keep = {0, 5}
    full, _ = run_virtual_circuit(virt, project=False)
    want = _marginalize_full(full.values, full.bit_positions, sorted(keep))

    for engine in ("xla", "streamed", "sharded"):
        marg, _ = run_virtual_circuit(virt, engine=engine, project=False,
                                      keep_clbits=keep)
        assert marg.bit_positions == sorted(keep), engine
        np.testing.assert_allclose(
            np.asarray(marg.values, np.float64), want, atol=2e-5,
            err_msg=engine,
        )

    est, _ = run_virtual_circuit(virt, engine="sampled", shots=30000,
                                 seed=3, keep_clbits=keep,
                                 sample_method="lhs")
    assert est.bit_positions == sorted(keep)
    np.testing.assert_allclose(np.asarray(est.values), want, atol=0.05)

    # shots sample the marginal (streamed: on-device projection+sampling)
    shot, _ = run_virtual_circuit(virt, engine="streamed", shots=40000,
                                  seed=5, keep_clbits=keep)
    assert shot.bit_positions == sorted(keep)
    np.testing.assert_allclose(np.asarray(shot.values), want, atol=0.03)

    # a marginal run's checkpoint must never be resumed by a different
    # keep set (or a full-width run)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        _stream_fingerprint,
    )

    fps = {
        _stream_fingerprint(virt, 16, 4, [None], None, 0, keep_clbits=kc)
        for kc in (None, frozenset({0, 5}), frozenset({1, 4}))
    }
    assert len(fps) == 3
