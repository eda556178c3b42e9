"""Round-4 advisor fixes (ADVICE.md r3), locked by test:

1. PEC quasi-inverse site ordering: D^-1 immediately after its
   depolarising site, BEFORE thermal-relaxation sites (relaxation is
   non-unital and does not commute with depolarising, so D^-1.R.D != R).
2. zne_expectation_z(method="exp") rejects a stray ``order=``.
3. expectation_z_multi / streamed_expectation_z z-support validation
   raises ValueError (survives ``python -O``), not bare assert.
4. mitigate_readout raises a named error on a (near-)singular readout
   channel instead of LinAlgError/amplified garbage.
"""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.mitigation import (
    mitigate_readout,
    zne_expectation_z,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    NoiseModel,
    gate_noise_sites,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    Distribution,
)


def _site_channel(probs, bank, weights):
    """Complex 4x4 superoperator (column-stacked) of one noise site in
    EXPECTATION: E(rho) = sum_i probs_i * w_i * K_i rho K_i^dag."""
    w = np.ones(len(probs)) if weights is None else np.asarray(weights)
    sup = np.zeros((4, 4), dtype=np.complex128)
    for i in range(len(probs)):
        k = bank[i][0, :, 0, :] + 1j * bank[i][1, :, 0, :]
        sup += probs[i] * w[i] * np.kron(np.conj(k), k)
    return sup


def _compose(sites):
    """Superoperator of the site list applied in order."""
    total = np.eye(4, dtype=np.complex128)
    for (_q, probs, bank, weights) in sites:
        total = _site_channel(probs, bank, weights) @ total
    return total


def test_pec_site_ordered_before_relaxation():
    """With pec=True and T1/T2 set, the expectation channel of the site
    list must equal relaxation ALONE (D^-1 cancels D exactly when
    adjacent; the pre-fix ordering D^-1.R.D leaves an O(p*(g+l)) bias)."""
    nm = NoiseModel(p1=0.08, p2=0.1, t1=4e-7, t2=3e-7, pec=True)
    assert nm.has_relaxation
    sites = [(0, *s[1:]) for s in gate_noise_sites(nm, (0,), (0,))]
    # structural: depol first, PEC (signed weights) second, relax after
    assert sites[0][3] is None and sites[1][3] is not None
    nm_plain = NoiseModel(p1=0.08, p2=0.1, t1=4e-7, t2=3e-7, pec=False)
    relax_only = gate_noise_sites(nm_plain, (0,), (0,))[1:]
    np.testing.assert_allclose(
        _compose(sites), _compose(relax_only), atol=1e-10
    )


def test_variant_engine_pec_slot_ordering():
    """The slot_post branch of make_sim_fn mirrors the same ordering:
    every PEC site (weights not None) follows its depolarising site with
    no relaxation site in between (same op index)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        make_sim_fn,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = Circuit(2, 2)
    c.h(0)
    c.cz(0, 1)
    c.measure(0, 0)
    c.measure(1, 1)
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=1,
                    maxNQpdCuts=2, maxNCuts=2)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    nm = NoiseModel(p1=0.02, p2=0.04, t1=4e-7, t2=3e-7, pec=True)
    for reg in virt.fragments:
        sim_one, *_ = make_sim_fn(virt, reg.name, noise=nm)
        sites = sim_one.noise_sites
        for i, (op_i, _q, _pr, _bank, w) in enumerate(sites):
            if w is not None:  # PEC site: predecessor is its depol site
                prev = sites[i - 1]
                assert prev[0] == op_i and prev[4] is None
                # and the predecessor is depolarising (uniform Pauli
                # bank), not relaxation: its probs are [1-p, p/3 x3]
                pr = np.asarray(prev[2])
                assert pr.shape == (4,) and pr[1] == pytest.approx(pr[2])


def test_zne_exp_rejects_order():
    c = Circuit(1, 1)
    c.h(0)
    c.measure(0, 0)
    with pytest.raises(ValueError, match="order"):
        zne_expectation_z(None, [0], NoiseModel(p1=0.01),
                          method="exp", order=2)


def test_z_support_validation_raises_value_error():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
        expectation_z_multi,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        streamed_expectation_z,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        run_all_fragments,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    c = Circuit(2, 2)
    c.h(0)
    c.cx(0, 1)
    c.measure(0, 0)  # clbit 1 never written
    cutter = Cutter(c, maxNPartitions=2, maxNQubitsPerPartition=1,
                    maxNQpdCuts=1, maxNCuts=1)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    results = run_all_fragments(virt)
    with pytest.raises(ValueError, match="never measured"):
        expectation_z_multi(virt, results, [{0, 1}])
    with pytest.raises(ValueError, match="never measured"):
        streamed_expectation_z(virt, [0, 1])


def test_mitigate_readout_singular_channel_named_error():
    d = Distribution(np.full(4, 0.25, np.float32), [0, 1], 2)
    nm = NoiseModel(readout01=0.5, readout10=0.5)  # det = 0
    with pytest.raises(ValueError, match="singular"):
        mitigate_readout(d, nm)
