"""Monte-Carlo QPD sampling estimator (ops/qpd_sampling.py).

The reference enumerates every label exhaustively; the sampler estimates
the same knit from importance-sampled labels with variance kappa/M.
"""
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
    nearest_probability_distribution,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
    _estimate,
    cut_gammas,
    sample_labels,
    sampled_knit,
    sampled_knit_adaptive,
    sampling_overhead,
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


def _cut_ghz(n=5, cap=3):
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return circ, VirtualCircuit(cutter.getResultCircs()[3])


def _cut_wire(n=4):
    """Force a wire cut so the move-spec (gamma=4) path is covered."""
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.cz(0, n - 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
                    forceNWireCuts=1)
    assert cutter.solve()
    return circ, VirtualCircuit(cutter.getResultCircs()[3])


def _full_grid(virt):
    """All labels (vgate-index order) + their exact sampling mass."""
    sizes = [vg.spec.num_instantiations for vg in virt.vgates]
    grid = np.indices(sizes).reshape(len(sizes), -1).T.astype(np.int32)
    mass = np.ones(len(grid), np.float64)
    for g, vg in enumerate(virt.vgates):
        c = np.asarray(vg.spec.coef, np.float64)
        m = np.maximum(np.abs(c[:, 0]), np.abs(c[:, 1]))
        mass *= (m / m.sum())[grid[:, g]]
    return grid, mass


def test_gammas_match_theory():
    _, virt = _cut_ghz()
    assert cut_gammas(virt) == [3.0] * len(virt.vgates)  # gate cuts
    _, virt_w = _cut_wire()
    assert 4.0 in cut_gammas(virt_w)  # wire cut (move spec)

    over = sampling_overhead(virt, eps=0.1)
    g = 3.0 ** len(virt.vgates)
    assert over["gamma_total"] == pytest.approx(g)
    assert over["kappa"] == pytest.approx(g * g)
    assert over["shots_for_eps"] == int(np.ceil(g * g / 0.01))


@pytest.mark.parametrize("maker", [_cut_ghz, _cut_wire])
def test_estimate_on_full_grid_equals_exact_knit(maker):
    """Unbiasedness, checked exactly: feeding the estimator the full
    label grid weighted by each label's sampling probability must
    reproduce the exact knit (no Monte-Carlo noise in this identity)."""
    _, virt = maker()
    grid, mass = _full_grid(virt)
    est = _estimate(virt, grid, mass)
    want, _ = run_virtual_circuit(virt, project=False)
    assert list(est.bit_positions) == list(want.bit_positions)
    np.testing.assert_allclose(
        np.asarray(est.values), np.asarray(want.values), atol=2e-5
    )


def test_sampled_knit_converges():
    orig, virt = _cut_ghz()
    over = sampling_overhead(virt)
    m = 40000
    est = sampled_knit(virt, m, seed=1)
    ideal = simulate_circuit(orig)
    err = float(np.max(np.abs(np.asarray(est.values)
                              - np.asarray(ideal.values))))
    # per-entry std <= gamma_total / sqrt(M); allow 5 sigma
    assert err < 5 * over["gamma_total"] / np.sqrt(m), err
    fid = hellinger_fidelity(ideal, nearest_probability_distribution(est))
    assert fid > 0.99, fid


def test_sampled_knit_marginal():
    """keep_clbits estimates the exact marginal (wide-circuit mode)."""
    orig, virt = _cut_ghz()
    keep = {0, 4}
    est = sampled_knit(virt, 40000, seed=2, keep_clbits=keep)
    assert list(est.bit_positions) == sorted(keep)
    ideal = simulate_circuit(orig)
    v = np.asarray(ideal.values).reshape(-1)
    marg = np.zeros(4)
    for i, p in enumerate(v):
        marg[((i >> 4) & 1) << 1 | (i & 1)] += p  # clbits 0 (LSB) and 4
    np.testing.assert_allclose(
        np.asarray(est.values), marg, atol=0.06
    )


def test_fewer_unique_instances_than_grid():
    """The point of sampling: far fewer simulated instances than the
    exhaustive grid when the budget is below the label count."""
    _, virt = _cut_ghz(n=7, cap=4)  # >= 2 cuts
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    m = max(4, total // 8)
    labels = sample_labels(virt, m, seed=3)
    uniq = np.unique(labels, axis=0)
    assert len(uniq) <= m < total


def test_run_virtual_circuit_sampled_engine():
    orig, virt = _cut_ghz()
    dist, info = run_virtual_circuit(virt, engine="sampled", shots=30000,
                                     seed=4)
    fid = hellinger_fidelity(simulate_circuit(orig), dist)
    assert fid > 0.99, fid
    assert info.run_time > 0


def _cut_three_fragments():
    """3-fragment chain via explicit vgates (as __graft_entry__ does)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Instruction,
        Register,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
        VirtualGateOp,
    )

    n = 6
    orig = Circuit(n, n)
    orig.h(0)
    for i in range(n - 1):
        if i in (1, 3):
            orig.cz(i, i + 1)
        else:
            orig.cx(i, i + 1)
    for q in range(n):
        orig.measure(q, q)

    cut = Circuit(
        [Register("f0", 2), Register("f1", 2), Register("f2", 2)], n
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


def test_estimate_full_grid_three_fragments():
    """>=3 fragments through the label-axis einsum: the full-grid
    identity must still reproduce the exact knit (guards the fold-twin
    against drift beyond the 2-fragment shape)."""
    _, virt = _cut_three_fragments()
    assert len(virt.fragments) == 3
    grid, mass = _full_grid(virt)
    est = _estimate(virt, grid, mass)
    want, _ = run_virtual_circuit(virt, project=False)
    assert list(est.bit_positions) == list(want.bit_positions)
    np.testing.assert_allclose(
        np.asarray(est.values), np.asarray(want.values), atol=2e-5
    )


def test_sample_label_counts_chunked_matches_total():
    _, virt = _cut_ghz()
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sample_label_counts,
    )

    uniq, counts = sample_label_counts(virt, 5000, seed=9, chunk=700)
    assert counts.sum() == 5000
    assert len(uniq) == len(np.unique(uniq, axis=0))


def test_sample_label_counts_packed_dedup_matches_dict_path():
    """The int64 mixed-radix dedup fast path must reproduce the
    tuple-dict reference EXACTLY — same lexicographic row order (the
    collapse engine's branch draws are row-order-dependent) and same
    counts — across chunking and both sampling methods."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sample_label_counts,
        sample_labels,
    )

    for mk in (_cut_ghz, _cut_rzz):
        _, virt = mk()
        for method in ("iid", "lhs"):
            uniq, counts = sample_label_counts(
                virt, 4000, seed=11, chunk=900, method=method
            )
            # reference: the pre-r4 dict accumulation, inlined
            acc: dict[tuple, int] = {}
            done, rng_seed = 0, 11
            while done < 4000:
                lab = sample_labels(
                    virt, min(900, 4000 - done), seed=rng_seed,
                    method=method,
                )
                rng_seed += 1
                u, c = np.unique(lab, axis=0, return_counts=True)
                for row, k in zip(u, c):
                    key = tuple(int(v) for v in row)
                    acc[key] = acc.get(key, 0) + int(k)
                done += len(lab)
            ref_u = np.array(sorted(acc), np.int32).reshape(
                len(acc), len(virt.vgates)
            )
            ref_c = np.array([acc[tuple(map(int, r))] for r in ref_u])
            np.testing.assert_array_equal(uniq, ref_u)
            np.testing.assert_array_equal(counts, ref_c)


def _cut_rzz(n=6, theta=0.3):
    """Plan with 2 cuts, one parameterised (rzz): non-uniform magnitudes
    exercise both the LHS allocation and the stratified head."""
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.rzz(theta, 2, 3)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return circ, VirtualCircuit(cutter.getResultCircs()[3])


def test_lhs_variant_counts_balanced():
    """Balanced sampling pins each cut's empirical variant counts to
    within 1 of n * p (the systematic-resampling allocation)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _variant_magnitudes,
    )

    _, virt = _cut_rzz()
    assert len(virt.vgates) >= 2
    n = 1000
    lab = sample_labels(virt, n, seed=0, method="lhs")
    for g, vg in enumerate(virt.vgates):
        m = _variant_magnitudes(vg.spec)
        p = m / m.sum()
        cnt = np.bincount(lab[:, g], minlength=len(m))
        assert np.abs(cnt - n * p).max() < 1.0, g

    with pytest.raises(ValueError, match="unknown sampling method"):
        sample_labels(virt, 10, method="sobol")


def test_lhs_single_cut_error_bound():
    """On a single-cut plan LHS is exact up to the per-variant rounding
    (|count - n*p| < 1): the estimator error is O(gamma * V / n), not
    O(gamma / sqrt(n)) — a deterministic bound, no Monte-Carlo luck.
    Measured: 0.0008 mean L2 at n=2000 vs iid's 0.026 (34x)."""
    orig, virt = _cut_ghz()
    assert len(virt.vgates) == 1
    n_variants = virt.vgates[0].spec.num_instantiations
    gamma = sampling_overhead(virt)["gamma_total"]
    m = 2000
    ideal = np.asarray(simulate_circuit(orig).values)
    for seed in range(3):
        est = sampled_knit(virt, m, seed=seed, method="lhs")
        err = float(np.linalg.norm(np.asarray(est.values) - ideal))
        # mass deviates < 1/m per variant; each variant's signed knit row
        # has L2 norm <= 1
        assert err < n_variants * gamma / m + 1e-6, (seed, err)


def test_lhs_composes_with_stratified_head():
    orig, virt = _cut_rzz()
    est, stderr = sampled_knit(virt, 3000, seed=1, method="lhs",
                               head_labels=8, with_stderr=True)
    ideal = simulate_circuit(orig)
    fid = hellinger_fidelity(ideal, nearest_probability_distribution(est))
    assert fid > 0.99, fid
    errs = np.abs(np.asarray(est.values) - np.asarray(ideal.values))
    # iid-formula stderr upper-bounds LHS variance: coverage must hold
    assert (errs <= 4 * stderr + 1e-12).mean() > 0.97


def test_run_sample_method_validation_and_lhs_engine():
    orig, virt = _cut_ghz()
    with pytest.raises(ValueError, match="sampled-engine"):
        run_virtual_circuit(virt, engine="xla", sample_method="lhs")
    dist, _ = run_virtual_circuit(virt, engine="sampled", shots=20000,
                                  seed=6, sample_method="lhs")
    fid = hellinger_fidelity(simulate_circuit(orig), dist)
    assert fid > 0.999, fid


def test_sampled_knit_stderr_calibration():
    """Reported per-outcome stderr must (a) respect the analytic
    gamma/sqrt(M) bound and (b) actually cover the realised error: the
    true value should land within 4 reported sigmas for ~every outcome,
    and the stderr must not be wildly pessimistic either (the realised
    max |error| should exceed 0.1x the max stderr)."""
    orig, virt = _cut_ghz()
    m = 20000
    est, stderr = sampled_knit(virt, m, seed=5, with_stderr=True)
    over = sampling_overhead(virt)
    assert stderr.shape == np.asarray(est.values).shape
    assert float(stderr.max()) <= over["gamma_total"] / np.sqrt(m) + 1e-9

    ideal = np.asarray(simulate_circuit(orig).values)
    errs = np.abs(np.asarray(est.values) - ideal)
    cover = errs <= 4 * stderr + 1e-12
    assert cover.mean() > 0.97, (errs.max(), stderr.max())
    assert errs.max() > 0.1 * stderr.max()


def test_adaptive_meets_eps_and_is_calibrated():
    """sampled_knit_adaptive grows the budget until the worst reported
    stderr is <= eps, and the realised error is consistent with it."""
    orig, virt = _cut_ghz()
    eps = 0.02
    est, se, used = sampled_knit_adaptive(virt, eps, seed=7, initial=512)
    assert float(se.max()) <= eps
    assert used >= 512
    ideal = np.asarray(simulate_circuit(orig).values)
    errs = np.abs(np.asarray(est.values) - ideal)
    assert (errs <= 4 * se + eps).all(), (errs.max(), se.max())
    # Hellinger over 2^n outcomes each off by ~eps deflates sublinearly;
    # the rigorous accuracy claim is the per-outcome bound above
    fid = hellinger_fidelity(
        simulate_circuit(orig), nearest_probability_distribution(est)
    )
    assert fid > 0.94, fid


def test_adaptive_budget_cap_returns_best_effort():
    """An unreachable eps stops at max_samples and returns the estimate
    (stderr above target, warning logged) instead of spinning."""
    _, virt = _cut_ghz()
    est, se, used = sampled_knit_adaptive(
        virt, 1e-6, seed=8, initial=64, max_samples=256
    )
    assert used == 256
    assert float(se.max()) > 1e-6
    assert np.asarray(est.values).size == 1 << virt.num_clbits
    with pytest.raises(ValueError, match="eps must be positive"):
        sampled_knit_adaptive(virt, 0.0)


def test_adaptive_composes_with_lhs_and_head():
    orig, virt = _cut_rzz()
    est, se, used = sampled_knit_adaptive(
        virt, 0.03, seed=9, initial=512, method="lhs", head_labels=8
    )
    assert float(se.max()) <= 0.03
    ideal = np.asarray(simulate_circuit(orig).values)
    errs = np.abs(np.asarray(est.values) - ideal)
    assert (errs <= 4 * se + 0.03).all(), (errs.max(), se.max())
    fid = hellinger_fidelity(
        simulate_circuit(orig), nearest_probability_distribution(est)
    )
    assert fid > 0.9, fid


def test_run_sample_eps_knob():
    orig, virt = _cut_ghz()
    with pytest.raises(ValueError, match="sampled-engine"):
        run_virtual_circuit(virt, engine="streamed", sample_eps=0.05)
    dist, info = run_virtual_circuit(
        virt, engine="sampled", sample_eps=0.05, seed=10
    )
    fid = hellinger_fidelity(simulate_circuit(orig), dist)
    assert fid > 0.99, fid
    assert info.run_time > 0


def test_cv_full_grid_is_exact_noop():
    """Control-variate stats on the full exact-mass grid: the Y moment
    must hit its known expectation exactly (y_mean = sum_x exact = 1 by
    trace preservation), so the CV adjustment is identically zero."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _cv_adjust,
    )

    for maker in (_cut_ghz, _cut_wire):
        _, virt = maker()
        grid, mass = _full_grid(virt)
        est, m2, stats = _estimate(virt, grid, mass, second_moment=True,
                                   control_stats=True)
        assert stats["y_mean"] == pytest.approx(1.0, abs=2e-5)
        vals = np.asarray(est.values)
        adj, _ = _cv_adjust(vals, m2, stats, 1.0)
        np.testing.assert_allclose(adj, vals, atol=2e-5)


def test_cv_never_increases_stderr_and_helps_on_ghz():
    """adj_var = var_x - cov^2/var_y <= var_x pointwise by construction;
    on the GHZ plan the shared sign-product noise dominates, so the
    measured reduction is substantial (~0.7x stderr = ~2x fewer samples
    for equal accuracy; probe recorded in the commit message)."""
    orig, virt = _cut_ghz()
    ideal = np.asarray(simulate_circuit(orig).values)
    errs_p, errs_c, ratio = [], [], []
    for seed in range(8):
        ep, sp = sampled_knit(virt, 4000, seed=seed, with_stderr=True)
        ec, sc = sampled_knit(virt, 4000, seed=seed, with_stderr=True,
                              control_variate=True)
        assert (sc <= sp + 1e-12).all()
        errs_p.append(np.abs(np.asarray(ep.values) - ideal).max())
        errs_c.append(np.abs(np.asarray(ec.values) - ideal).max())
        ratio.append(sc.max() / sp.max())
    # realised error and reported stderr both drop on average
    assert np.mean(errs_c) < 0.9 * np.mean(errs_p), (errs_c, errs_p)
    assert np.mean(ratio) < 0.85, ratio


def test_cv_unbiased_across_seeds():
    """The plug-in-beta bias is O(1/N): the seed-averaged CV estimate
    must agree with the exact knit well inside the averaged stderr."""
    _, virt = _cut_ghz()
    exact, _ = run_virtual_circuit(virt, project=False)
    ev = np.asarray(exact.values)
    acc = np.zeros_like(ev)
    n_seeds = 16
    for seed in range(n_seeds):
        est = sampled_knit(virt, 4000, seed=100 + seed,
                           control_variate=True)
        acc += np.asarray(est.values)
    acc /= n_seeds
    # per-outcome stderr ~0.008 (probe); the mean of 16 has ~0.002
    np.testing.assert_allclose(acc, ev, atol=0.012)


def test_cv_composes_with_head_lhs_and_marginal():
    orig, virt = _cut_rzz()
    # head_labels + CV without stderr returns a bare Distribution
    # (the run.py path), identical values to the with_stderr twin
    bare = sampled_knit(virt, 3000, seed=11, method="lhs",
                        head_labels=8, control_variate=True)
    assert hasattr(bare, "values")
    est, stderr = sampled_knit(virt, 3000, seed=11, method="lhs",
                               head_labels=8, control_variate=True,
                               with_stderr=True)
    np.testing.assert_allclose(np.asarray(bare.values),
                               np.asarray(est.values))
    ideal = simulate_circuit(orig)
    fid = hellinger_fidelity(ideal, nearest_probability_distribution(est))
    assert fid > 0.99, fid
    errs = np.abs(np.asarray(est.values) - np.asarray(ideal.values))
    assert (errs <= 4 * stderr + 1e-12).mean() > 0.97

    # marginal + CV
    keep = {0, 2}
    est_m = sampled_knit(virt, 3000, seed=12, keep_clbits=keep,
                         control_variate=True)
    assert list(est_m.bit_positions) == sorted(keep)
    v = np.asarray(ideal.values).reshape(-1)
    marg = np.zeros(4)
    for i, p in enumerate(v):
        marg[((i >> 2) & 1) << 1 | (i & 1)] += p
    np.testing.assert_allclose(np.asarray(est_m.values), marg, atol=0.06)


def test_run_sample_cv_knob():
    orig, virt = _cut_ghz()
    with pytest.raises(ValueError, match="sampled-engine"):
        run_virtual_circuit(virt, engine="xla", sample_cv=True)
    dist, _ = run_virtual_circuit(virt, engine="sampled", shots=20000,
                                  seed=13, sample_cv=True)
    fid = hellinger_fidelity(simulate_circuit(orig), dist)
    assert fid > 0.99, fid
    # adaptive + CV: the CV-reduced stderr meets eps with FEWER samples,
    # so use an eps that still implies the fidelity bar
    dist, info = run_virtual_circuit(
        virt, engine="sampled", sample_eps=0.008, seed=14, sample_cv=True
    )
    fid = hellinger_fidelity(simulate_circuit(orig), dist)
    assert fid > 0.99, fid
    assert info.run_time > 0


# -- noisy x sampled composition -------------------------------------------


def test_noisy_sampled_readout_only_full_grid_identity():
    """Readout-only noise is deterministic (no trajectory sampling), so
    the sampled estimator over the FULL grid must equal the exact noisy
    engine's knit."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_noisy_virtual_circuit,
    )

    nm = NoiseModel("ro", p1=0.0, p2=0.0, readout01=0.05, readout10=0.02,
                    trajectories=4)
    for maker in (_cut_ghz, _cut_rzz):
        _, virt = maker()
        grid, mass = _full_grid(virt)
        est = _estimate(virt, grid, mass, noise=[nm] * len(virt.fragments))
        want, _ = run_noisy_virtual_circuit(virt, nm)
        # run_noisy projects; compare against the unprojected exact knit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
            knit,
        )
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
            run_fragment_noisy,
        )

        results = [
            run_fragment_noisy(virt, reg.name, nm, seed=0)
            for reg in virt.fragments
        ]
        exact = knit(virt, results)
        assert est.bit_positions == exact.bit_positions
        np.testing.assert_allclose(
            np.asarray(est.values), np.asarray(exact.values), atol=3e-5
        )


def test_noisy_sampled_statistical_agreement_and_cv():
    """With gate noise: the seed-averaged sampled estimate approaches
    the exact noisy knit, the noisy run is measurably different from
    the ideal one, and CV stderr stays monotone."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
        knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_fragment_noisy,
    )

    orig, virt = _cut_ghz()
    nm = NoiseModel("gn", p1=0.005, p2=0.05, readout01=0.03,
                    readout10=0.03, trajectories=64)
    results = [
        run_fragment_noisy(virt, reg.name, nm, seed=9)
        for reg in virt.fragments
    ]
    exact_noisy = np.asarray(knit(virt, results).values)
    ideal = np.asarray(simulate_circuit(orig).values)
    # the noise must actually bite, or the test is vacuous
    assert np.abs(exact_noisy - ideal).max() > 0.02

    acc = None
    for seed in range(4):
        est, se = sampled_knit(virt, 4000, seed=seed, noise=nm,
                               noise_seed=100 + seed, with_stderr=True)
        ec, sc = sampled_knit(virt, 4000, seed=seed, noise=nm,
                              noise_seed=100 + seed, with_stderr=True,
                              control_variate=True)
        assert (sc <= se + 1e-12).all()
        v = np.asarray(est.values)
        acc = v if acc is None else acc + v
    mean = acc / 4
    # trajectory + label sampling noise both shrink in the average
    assert np.abs(mean - exact_noisy).max() < 0.06, (
        np.abs(mean - exact_noisy).max()
    )


def test_noisy_sampled_run_level_and_guards():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_noisy_virtual_circuit,
    )

    orig, virt = _cut_ghz()
    nm = NoiseModel("gn", p1=0.001, p2=0.01, readout01=0.01,
                    readout10=0.01, trajectories=16)
    dist, info = run_noisy_virtual_circuit(
        virt, nm, engine="sampled", shots=20000, seed=3
    )
    fid = hellinger_fidelity(simulate_circuit(orig), dist)
    assert 0.9 < fid <= 1.0, fid  # mild noise: close to but below ideal
    assert info.run_time > 0
    vals = np.asarray(dist.values)
    assert vals.min() >= -1e-9  # projected

    import jax.numpy as jnp

    with pytest.raises(ValueError, match="exclusive"):
        sampled_knit(virt, 100, noise=nm, dtype=jnp.bfloat16)

    # untranspiled models run noise-free through the sampled path too
    # (reference semantics: no calibration entry matches a fragment's
    # instantiation gates) — the normaliser maps them to None outright
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _noise_models,
    )

    nm_u = NoiseModel("u", p1=0.5, p2=0.5, readout01=0.0, readout10=0.0,
                      trajectories=2, untranspiled=True)
    assert _noise_models(virt, nm_u) is None
    est = sampled_knit(virt, 20000, seed=5, noise=nm_u, method="lhs")
    fid_u = hellinger_fidelity(
        simulate_circuit(orig),
        nearest_probability_distribution(est),
    )
    assert fid_u > 0.99, fid_u
