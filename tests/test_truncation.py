"""Certified label truncation (approximate circuit cutting).

``trunc_eps`` drops the lowest-|coefficient-product| global QPD labels;
the knitted distribution may move at most ``meta["dropped_mass"]``
(<= trunc_eps) in L1 from exact.  Role of arXiv:2212.01270 (PAPERS.md);
the reference enumerates every label unconditionally
(qvm/virtual_circuit.py:183-190).
"""
import jax
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    label_strides,
    label_weight_bounds,
    truncate_labels,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut(circ, cap, parts=2):
    cutter = Cutter(circ, maxNPartitions=parts, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _skewed(n=6):
    """cp cuts with small angles: sharply skewed coefficient products."""
    circ = Circuit(n, n)
    for q in range(n):
        circ.h(q)
    circ.cp(np.pi / 8, 0, n - 1)
    circ.cp(np.pi / 16, 1, n - 2)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    return circ


def test_weight_bounds_sum_and_order():
    virt = _cut(_skewed(), 4)
    specs = [vg.spec for vg in virt.vgates]
    gstride, n_inst, total = label_strides(specs, range(len(specs)))
    w = label_weight_bounds(specs, gstride, n_inst, total)
    assert w.shape == (total,) and np.all(w > 0)
    # product structure: total bound mass == prod_g sum_v max_b |coef|
    per_g = [
        np.max(np.abs(np.asarray(s.coef)), axis=1).sum() for s in specs
    ]
    assert np.isclose(w.sum(), np.prod(per_g))
    kept, dropped = truncate_labels(specs, gstride, n_inst, total, 1e-2)
    assert dropped <= 1e-2
    assert 0 < len(kept) < total  # skewed cp cuts actually truncate


def test_truncated_within_certified_bound():
    virt = _cut(_skewed(), 4)
    exact = run_virtual_circuit_streamed(virt, chunk=32, project=False)
    for eps in (1e-4, 1e-2, 5e-2):
        step, xs, meta = make_streamed_knit(virt, 32, trunc_eps=eps,
                                            share_prefix=True)
        got = np.asarray(jax.jit(step)(xs))
        l1 = float(np.abs(got - np.asarray(exact.values)).sum())
        assert meta["dropped_mass"] <= eps
        assert l1 <= meta["dropped_mass"] + 1e-5, (eps, l1)
        if eps >= 1e-2:
            assert meta["kept_labels"] < meta["global_labels"]


def test_trunc_eps_zero_is_exact():
    virt = _cut(_skewed(), 4)
    a = run_virtual_circuit_streamed(virt, chunk=32)
    b = run_virtual_circuit_streamed(virt, chunk=32, trunc_eps=0.0)
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), atol=1e-7
    )


def test_uniform_cuts_keep_everything_below_common_weight():
    """cx/cz cuts have uniform 0.5 coefficient magnitudes — an eps below
    the smallest product drops nothing."""
    virt = _cut(genCirc("hwe", 8, 2), 5)
    specs = [vg.spec for vg in virt.vgates]
    gstride, n_inst, total = label_strides(specs, range(len(specs)))
    w = label_weight_bounds(specs, gstride, n_inst, total)
    kept, dropped = truncate_labels(
        specs, gstride, n_inst, total, 0.5 * float(w.min())
    )
    assert len(kept) == total and dropped == 0.0


def test_trunc_through_run_virtual_circuit():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    circ = _skewed()
    virt = _cut(circ, 4)
    dist, _ = run_virtual_circuit(virt, trunc_eps=1e-3)  # auto -> streamed
    fid = hellinger_fidelity(simulate_circuit(circ), dist)
    assert fid > 1 - 1e-2, fid

    with pytest.raises(ValueError):
        run_virtual_circuit(virt, engine="xla", trunc_eps=1e-3)


# ---------------------------------------------------------------------------
# Stratified QPD sampling (exact head + sampled tail)
# ---------------------------------------------------------------------------


def test_stratified_split_accounting():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampling_overhead,
        stratified_split,
    )

    virt = _cut(_skewed(), 4)
    split = stratified_split(virt, 64)
    assert split is not None
    rows, head_w, t, g_head, g_tail = split
    assert len(rows) <= 64 and np.all(head_w > t)
    over = sampling_overhead(virt)
    assert np.isclose(g_head + g_tail, over["gamma_total"])

    # uniform cuts below the grid size: no strict-majority head exists
    uni = _cut(genCirc("hwe", 8, 2), 5)
    specs = [vg.spec for vg in uni.vgates]
    total_u = int(np.prod([s.num_instantiations for s in specs]))
    assert stratified_split(uni, total_u - 1) is None
    # head budget >= the whole grid: exact enumeration, empty tail
    full = stratified_split(uni, total_u)
    assert full is not None and len(full[0]) == total_u and full[4] == 0.0


def test_stratified_beats_plain_on_skewed_cuts():
    """Same budget, skewed cp cuts: the stratified estimator's error and
    reported stderr must beat the plain estimator's (gamma_tail <<
    gamma_total)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_knit,
    )

    virt = _cut(_skewed(), 4)
    exact = run_virtual_circuit_streamed(virt, chunk=32, project=False)
    n = 400
    plain_err, strat_err, plain_se, strat_se = [], [], [], []
    for seed in (0, 1, 2):
        p, pse = sampled_knit(virt, n, seed=seed, with_stderr=True)
        s, sse = sampled_knit(virt, n, seed=seed, with_stderr=True,
                              head_labels=128)
        assert s.bit_positions == exact.bit_positions
        plain_err.append(
            np.abs(np.asarray(p.values) - np.asarray(exact.values)).sum()
        )
        strat_err.append(
            np.abs(np.asarray(s.values) - np.asarray(exact.values)).sum()
        )
        plain_se.append(float(np.mean(pse)))
        strat_se.append(float(np.mean(sse)))
    assert np.mean(strat_err) < np.mean(plain_err), (strat_err, plain_err)
    assert np.mean(strat_se) < np.mean(plain_se), (strat_se, plain_se)


def test_stratified_full_head_is_exact():
    """A head budget >= the whole (distinct-weight part of the) grid with
    an empty tail reproduces the exact knit with zero stderr."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_knit,
        stratified_split,
    )

    virt = _cut(_skewed(), 4)
    specs = [vg.spec for vg in virt.vgates]
    _, _, total = label_strides(specs, range(len(specs)))
    split = stratified_split(virt, total)
    if split is None or split[4] > 0:
        pytest.skip("grid has weight ties at the minimum; no empty tail")
    est, se = sampled_knit(virt, 10, head_labels=total, with_stderr=True)
    exact = run_virtual_circuit_streamed(virt, chunk=32, project=False)
    np.testing.assert_allclose(
        np.asarray(est.values), np.asarray(exact.values), atol=1e-6
    )
    assert np.all(se == 0.0)


def test_stratified_uniform_falls_back_to_plain():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_knit,
    )

    virt = _cut(genCirc("hwe", 8, 2), 5)
    a = sampled_knit(virt, 300, seed=5)
    b = sampled_knit(virt, 300, seed=5, head_labels=8)  # < grid size
    np.testing.assert_allclose(
        np.asarray(a.values), np.asarray(b.values), atol=1e-7
    )


def test_stratified_head_one_and_engine_validation():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        stratified_split,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    virt = _cut(_skewed(), 4)
    # a budget below the top tie-block size yields no head (ties go to
    # the tail, keeping membership weight-decidable)...
    assert stratified_split(virt, 8) is None
    # ...a budget above it yields a real, within-budget head
    split = stratified_split(virt, 64)
    assert split is not None and 1 <= len(split[0]) <= 64
    with pytest.raises(ValueError):
        run_virtual_circuit(virt, engine="streamed", head_labels=8)


def test_trunc_composes_with_shots_and_marginal():
    """Truncation must compose with on-device shot sampling and the
    marginal knit (the serving combinations)."""
    virt = _cut(_skewed(), 4)
    shot = run_virtual_circuit_streamed(
        virt, chunk=32, shots=2000, trunc_eps=1e-3, seed=2
    )
    assert abs(float(np.asarray(shot.values).sum()) - 1.0) < 1e-5

    import jax

    keep = frozenset([0, 1])
    exact_step, exact_xs, _ = make_streamed_knit(
        virt, 32, keep_clbits=keep
    )
    exact = np.asarray(jax.jit(exact_step)(exact_xs))
    step, xs, meta = make_streamed_knit(
        virt, 32, keep_clbits=keep, trunc_eps=1e-3
    )
    got = np.asarray(jax.jit(step)(xs))
    assert np.abs(got - exact).sum() <= meta["dropped_mass"] + 1e-5
