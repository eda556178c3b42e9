"""Error mitigation: readout inversion + zero-noise extrapolation."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.mitigation import (
    mitigate_readout,
    richardson_extrapolate,
    scale_noise,
    zne_expectation_z,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    NoiseModel,
    apply_readout_error,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    Distribution,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _rand_dist(k, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.random(1 << k).astype(np.float32)
    v /= v.sum()
    return Distribution(v, list(range(k)), k)


def test_readout_inverse_exact_scalar_rates():
    d = _rand_dist(4)
    nm = NoiseModel(readout01=0.02, readout10=0.05)
    noisy = apply_readout_error(d, nm)
    back = mitigate_readout(noisy, nm)
    np.testing.assert_allclose(back.values, d.values, atol=1e-6)


def test_readout_inverse_exact_calibrated():
    d = _rand_dist(3, seed=1)
    nm = NoiseModel(
        ro01_q=np.array([0.01, 0.03, 0.02]),
        ro10_q=np.array([0.04, 0.02, 0.06]),
    )
    bq = [2, 0, 1]
    noisy = apply_readout_error(d, nm, bit_qubits=bq)
    back = mitigate_readout(noisy, nm, bit_qubits=bq)
    np.testing.assert_allclose(back.values, d.values, atol=1e-6)
    # mismatched calibration does NOT invert
    wrong = mitigate_readout(noisy, nm, bit_qubits=[0, 1, 2])
    assert np.abs(np.asarray(wrong.values) - np.asarray(d.values)).max() > 1e-4


def test_scale_noise_semantics():
    nm = NoiseModel(p1=0.3, p2=0.01, t1=1.0, t2=1.5,
                    gate_time_1q=0.1, gate_time_2q=0.2,
                    readout01=0.02, readout10=0.05,
                    p2_q=np.array([0.6, 0.8]))
    s = scale_noise(nm, 2.0)
    assert s.p1 == pytest.approx(0.6)
    assert s.p2 == pytest.approx(0.02)
    np.testing.assert_allclose(s.p2_q, [1.0, 1.0])  # clipped
    # relaxation scales through durations: gamma(2x) == gamma(d*2)
    g2, _ = s.relax_gamma_lambda(0, s.gate_time_1q)
    g_ref, _ = nm.relax_gamma_lambda(0, 2 * nm.gate_time_1q)
    assert g2 == pytest.approx(g_ref)
    # readout untouched
    assert s.readout01 == nm.readout01 and s.readout10 == nm.readout10
    # scale 0 = noiseless gates
    z = scale_noise(nm, 0.0)
    assert z.p1 == 0.0 and z.relax_gamma_lambda(0, z.gate_time_1q) == (0.0, 0.0)


def test_exponential_extrapolation():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.mitigation import (
        exponential_extrapolate,
    )

    s = [1.0, 2.0, 3.0]
    v = [0.9 * np.exp(-0.4 * x) for x in s]
    assert exponential_extrapolate(s, v) == pytest.approx(0.9, abs=1e-10)
    # non-positive sample -> linear-Richardson fallback, no crash
    assert np.isfinite(exponential_extrapolate([1.0, 2.0], [0.1, -0.05]))


def test_richardson_exact_on_polynomial():
    # values lie on v(s) = 1 - 0.1 s - 0.02 s^2 -> v(0) = 1
    s = [1.0, 2.0, 3.0]
    v = [1 - 0.1 * x - 0.02 * x * x for x in s]
    assert richardson_extrapolate(s, v) == pytest.approx(1.0, abs=1e-12)
    # linear fit on linear data
    v1 = [1 - 0.1 * x for x in s]
    assert richardson_extrapolate(s, v1, order=1) == pytest.approx(1.0)


def test_zne_recovers_ghz_parity():
    """<Z Z Z Z> of a cut GHZ-4 is exactly 1; depolarising noise biases
    it down; ZNE recovers most of the bias."""
    c = Circuit(4, 4)
    c.h(0)
    for i in range(3):
        c.cx(i, i + 1)
    for i in range(4):
        c.measure(i, i)
    cut = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=[3, 3])
    assert cut.solve()
    virt = VirtualCircuit(cut.getResultCircs()[3])
    nm = NoiseModel(p1=0.004, p2=0.02, readout01=0.0, readout10=0.0,
                    trajectories=96)
    est, vals = zne_expectation_z(
        virt, z_clbits={0, 1, 2, 3}, noise=nm, scales=(1.0, 2.0, 3.0),
        order=1, seed=7,
    )
    raw = vals[0]
    assert raw < 0.97          # the noise visibly bites
    assert vals[2] < vals[0]   # more noise -> more bias (monotone)
    assert abs(est - 1.0) < 0.5 * abs(raw - 1.0)  # ZNE recovers >half
    assert est <= 1.1


def test_zne_with_relaxation_and_fragment_list():
    """ZNE accepts per-fragment model lists and T1/T2 models (relaxation
    scales through the stretched durations)."""
    c = Circuit(4, 4)
    c.h(0)
    for i in range(3):
        c.cx(i, i + 1)
    for i in range(4):
        c.measure(i, i)
    cut = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=[3, 3])
    assert cut.solve()
    virt = VirtualCircuit(cut.getResultCircs()[3])
    nm = NoiseModel(p1=0.002, p2=0.01, readout01=0.0, readout10=0.0,
                    t1=40e-6, t2=50e-6, trajectories=64)
    models = [nm for _ in virt.fragments]
    est, vals = zne_expectation_z(
        virt, z_clbits={0, 1, 2, 3}, noise=models, scales=(1.0, 2.0),
        seed=3,
    )
    assert vals[1] < vals[0] < 1.0
    assert abs(est - 1.0) < abs(vals[0] - 1.0)
