"""Observable estimation: <Z_S> via per-fragment scalar contraction vs the
full knitted distribution."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    expectation_z,
    knit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_all_fragments,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _setup():
    rng = np.random.default_rng(9)
    n = 6
    circ = Circuit(n, n)
    for q in range(n):
        circ.ry(float(rng.standard_normal()), q)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    circ.rzz(0.5, 0, n - 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    results = run_all_fragments(virt)
    return virt, results


def _expect_from_dist(dist, z_clbits):
    vals = np.asarray(dist.values, dtype=np.float64)
    total = 0.0
    for i, v in enumerate(vals):
        parity = 0
        for c in z_clbits:
            parity ^= (i >> dist.bit_positions.index(c)) & 1
        total += v * (1 - 2 * parity)
    return total


@pytest.mark.parametrize("z", [[0], [5], [0, 5], [1, 2, 3], [0, 1, 2, 3, 4, 5]])
def test_expectation_z_matches_distribution(z):
    virt, results = _setup()
    full = knit(virt, results)
    want = _expect_from_dist(full, z)
    got = expectation_z(virt, results, z)
    assert got == pytest.approx(want, abs=2e-6), (z, got, want)


def test_expectation_identity_is_total():
    virt, results = _setup()
    full = knit(virt, results)
    got = expectation_z(virt, results, [])
    assert got == pytest.approx(float(np.sum(full.values)), abs=2e-6)


def test_streamed_expectation_matches_batched():
    """streamed_expectation_z (scalar carry in the scan) vs the batched
    expectation_z and the knitted-distribution oracle, on a mixed cut."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        streamed_expectation_z,
    )

    virt, results = _setup()
    full = knit(virt, results)
    for z in ([0], [0, 3], [1, 4, 5], [0, 1, 2, 3, 4, 5]):
        want = _expect_from_dist(full, z)
        batched = expectation_z(virt, results, z)
        streamed = streamed_expectation_z(virt, z, chunk=8)
        assert abs(batched - want) < 2e-6, (z, batched, want)
        assert abs(streamed - want) < 1e-5, (z, streamed, want)


def test_sampled_expectation_full_grid_identity():
    """_estimate_z on the FULL label grid with exact sampling mass must
    reproduce the exact expectation_z for every z-set (the identity the
    Monte-Carlo estimator is unbiased against)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _estimate_z,
    )
    from tests.test_qpd_sampling import _full_grid

    virt, results = _setup()
    z_sets = [[], [0], [0, 5], [1, 2, 3], [0, 1, 2, 3, 4, 5]]
    grid, mass = _full_grid(virt)
    got = _estimate_z(virt, grid, mass, [set(s) for s in z_sets])
    for s, g in zip(z_sets, got):
        want = expectation_z(virt, results, s)
        assert g == pytest.approx(want, abs=2e-5), (s, g, want)


def test_sampled_expectation_stderr_coverage():
    """Sampled <Z_S> is unbiased and the reported stderr brackets the
    realised error (4-sigma over seeds and sets)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_expectation_z,
    )

    virt, results = _setup()
    z_sets = [[0], [0, 3], [1, 4, 5]]
    want = np.array([expectation_z(virt, results, s) for s in z_sets])
    hits, tot = 0, 0
    acc = np.zeros(len(z_sets))
    for seed in range(6):
        est, se = sampled_expectation_z(virt, z_sets, 4000, seed=seed,
                                        with_stderr=True)
        hits += int(((np.abs(est - want) <= 4 * se + 1e-9)).sum())
        tot += len(z_sets)
        acc += est
    assert hits / tot > 0.9, (hits, tot)
    np.testing.assert_allclose(acc / 6, want, atol=0.05)


def test_sampled_expectation_cv_exact_on_identity_and_reduces():
    """The empty z-set IS the control (X == Y): CV returns exactly 1
    with ~0 stderr.  On real sets the CV stderr never exceeds the plain
    one and is measurably smaller on average."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_expectation_z,
    )

    virt, _ = _setup()
    z_sets = [[], [0], [0, 3], [1, 4, 5], [0, 1, 2, 3, 4, 5]]
    ratios = []
    for seed in range(4):
        ep, sp = sampled_expectation_z(virt, z_sets, 3000, seed=seed,
                                       with_stderr=True)
        ec, sc = sampled_expectation_z(virt, z_sets, 3000, seed=seed,
                                       with_stderr=True,
                                       control_variate=True)
        assert ec[0] == pytest.approx(1.0, abs=1e-6)
        assert sc[0] == pytest.approx(0.0, abs=1e-6)
        assert (sc <= sp + 1e-12).all()
        ratios.append(float(sc[1:].mean() / sp[1:].mean()))
    assert np.mean(ratios) < 0.9, ratios


def test_sampled_expectation_head_lhs_composition():
    """Stratified head + balanced tail + CV on the rzz (skewed) plan."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_expectation_z,
    )

    virt, results = _setup()
    z_sets = [[0], [1, 4]]
    want = np.array([expectation_z(virt, results, s) for s in z_sets])
    est, se = sampled_expectation_z(
        virt, z_sets, 3000, seed=7, method="lhs", head_labels=8,
        with_stderr=True, control_variate=True,
    )
    np.testing.assert_allclose(est, want, atol=0.08)
    assert (np.abs(est - want) <= 4 * se + 0.02).all()
    # the whole-grid head degenerates to the exact answer, zero stderr
    est2, se2 = sampled_expectation_z(
        virt, z_sets, 100, seed=7, head_labels=1 << 20, with_stderr=True,
    )
    np.testing.assert_allclose(est2, want, atol=2e-5)
    np.testing.assert_allclose(se2, 0.0, atol=1e-12)


def test_streamed_noisy_expectation():
    """Noisy observable serving: the scalar-carry expectation under the
    trajectory-noise engine agrees with the parity computed from the
    noisy streamed distribution (same seed/engine)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        run_virtual_circuit_streamed,
        streamed_expectation_z,
    )

    virt, _ = _setup()
    nm = NoiseModel("test", p1=0.003, p2=0.02,
                    readout01=0.01, readout10=0.02, trajectories=3)
    dist = run_virtual_circuit_streamed(
        virt, chunk=8, noise=nm, seed=5, project=False
    )
    for z in ([0], [1, 4]):
        want = _expect_from_dist(dist, z)
        got = streamed_expectation_z(virt, z, chunk=8, noise=nm, seed=5)
        assert abs(got - want) < 1e-5, (z, got, want)


def test_sampled_expectation_adaptive():
    """eps-targeted observable budget: stops once every set's empirical
    stderr <= eps, estimates agree with the exact oracle inside it, and
    CV lets the same eps be met with no more samples."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_expectation_z_adaptive,
    )

    virt, results = _setup()
    z_sets = [[0], [0, 3]]
    want = np.array([expectation_z(virt, results, s) for s in z_sets])
    est, se, n = sampled_expectation_z_adaptive(
        virt, z_sets, eps=0.03, seed=5
    )
    assert (se <= 0.03 + 1e-12).all()
    np.testing.assert_allclose(est, want, atol=0.12)
    est_cv, se_cv, n_cv = sampled_expectation_z_adaptive(
        virt, z_sets, eps=0.03, seed=5, control_variate=True
    )
    assert n_cv <= n
    np.testing.assert_allclose(est_cv, want, atol=0.12)
    with pytest.raises(ValueError, match="positive"):
        sampled_expectation_z_adaptive(virt, z_sets, eps=0.0)


def test_sampled_expectation_noisy_readout_identity():
    """Readout-only noise (deterministic): sampled observables on the
    full grid equal the parity fold of the exact noisy knit."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
        knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
        run_fragment_noisy,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _estimate_z,
        _noise_models,
    )
    from tests.test_qpd_sampling import _full_grid

    virt, _ = _setup()
    nm = NoiseModel("ro", p1=0.0, p2=0.0, readout01=0.06, readout10=0.03,
                    trajectories=4)
    grid, mass = _full_grid(virt)
    z_sets = [set(), {0}, {0, 3}, {1, 4, 5}]
    got = _estimate_z(virt, grid, mass, z_sets,
                      noise=_noise_models(virt, nm))
    results = [
        run_fragment_noisy(virt, reg.name, nm, seed=0)
        for reg in virt.fragments
    ]
    noisy = knit(virt, results)
    for zs, g in zip(z_sets, got):
        want = _expect_from_dist(noisy, zs)
        assert g == pytest.approx(want, abs=3e-5), (zs, g, want)
