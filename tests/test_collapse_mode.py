"""Collapse-mode sampled execution + the blocked scan estimator core.

The ancilla (deferred-measurement) path costs one sim qubit per measuring
cut — qft-16's 15|1 gamma-mode plan would need 2^30 states.  Collapse
mode (ops/variant_engine.collapse_qubit) samples the measurement outcomes
jointly with the QPD labels, keeping the state at the data qubits; the
scan core (ops/qpd_sampling._scan_core) bounds the peak buffer at
``block x 2^width``.  Together they are the qft-16 execution path
(VERDICT r3 action #1; benchmarks/qft16_sampled.py).
"""
import math

import numpy as np
import pytest

import jax.numpy as jnp

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qft import (
    library_qft,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops import (
    qpd_sampling as qs,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit_host,
    to_real_block,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    collapse_qubit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _rand_state(n, seed):
    rng = np.random.default_rng(seed)
    amp = rng.normal(size=(1 << n)) + 1j * rng.normal(size=(1 << n))
    amp /= np.linalg.norm(amp)
    st = np.stack([amp.real, amp.imag]).astype(np.float32)
    return st


def _prepped_qft(n, seed=5):
    """Random-product-state input + QFT + terminal measures: the
    non-degenerate qft test circuit (plain QFT|0..0> is uniform)."""
    rng = np.random.default_rng(seed)
    circ = Circuit(n, n)
    for q in range(n):
        circ.h(q)
        circ.rz(float(rng.uniform(0, 2 * math.pi)), q)
    for ins in library_qft(n).instructions:
        circ.instructions.append(ins.copy())
    for q in range(n):
        circ.measure(q, q)
    return circ


def _gamma_cut(circ, n):
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=n - 1,
                    gammaMode=True)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def _oracle_marginal(circ, n, keep):
    probs = np.asarray(simulate_circuit_host(circ).values, np.float64)
    v = probs.reshape([2] * n)  # axis n-1-j carries clbit j
    marg = v.sum(axis=tuple(
        a for a in range(n) if (n - 1 - a) not in keep
    ))
    # marg axes are the kept clbits in DESCENDING clbit order
    desc = sorted(keep, reverse=True)
    out = np.empty(1 << len(keep))
    for b in range(1 << len(keep)):
        idx = tuple((b >> keep.index(c)) & 1 for c in desc)
        out[b] = marg[idx]
    return out


def test_collapse_qubit_expectation_exact():
    """E_u[w_b * |collapse(psi)|^2] == w0|P0 psi|^2 + w1|P1 psi|^2 —
    integrate the uniform by hand (the branch is a step function of u,
    so two evaluations and the exact branch probabilities suffice)."""
    n = 3
    st = _rand_state(n, 0)
    q = 1
    w0, w1 = 0.7, -1.3
    r = st.reshape(2, 1 << q, 2, 1 << (n - 1 - q))
    p0 = float((r[:, :, 0, :] ** 2).sum())
    p1 = float((r[:, :, 1, :] ** 2).sum())
    lo, wl = collapse_qubit(jnp.asarray(st), q, n, jnp.float32(0.0),
                            1.0, w0, w1)
    hi, wh = collapse_qubit(jnp.asarray(st), q, n, jnp.float32(0.999999),
                            1.0, w0, w1)
    mean = p0 * float(wl) * np.asarray(lo) ** 2 \
        + p1 * float(wh) * np.asarray(hi) ** 2
    expect = np.asarray(st) ** 2
    er = expect.reshape(2, 1 << q, 2, 1 << (n - 1 - q)).copy()
    er[:, :, 0, :] *= w0
    er[:, :, 1, :] *= w1
    np.testing.assert_allclose(
        mean.reshape(er.shape).sum(axis=(0,)), er.sum(axis=(0,)),
        atol=1e-5,
    )
    # mflag=0: exact passthrough with weight 1
    same, w = collapse_qubit(jnp.asarray(st), q, n, jnp.float32(0.3),
                             0.0, w0, w1)
    np.testing.assert_allclose(np.asarray(same), st, atol=0)
    assert float(w) == 1.0


def test_collapse_rows_unbiased_per_label():
    """Mean of collapse rows over many draws == the exact folded row,
    for a label where every cut measures (vmapped: one label replicated
    K times with independent u)."""
    circ = _prepped_qft(4)
    virt = _gamma_cut(circ, 4)
    G = len(virt.vgates)
    lab1 = np.full((1, G), 3, np.int32)  # variant 3 measures on side 0
    frag = virt.fragments[0].name
    rows_e, pos_e = qs._simulate_label_rows(virt, frag, jnp.asarray(lab1))
    rows_e, pos_e = qs._fold_rows_per_label(
        virt, frag, rows_e, jnp.asarray(lab1), pos_e
    )
    exact = np.asarray(rows_e)[0]
    K = 6000
    lab = np.repeat(lab1, K, axis=0)
    rows_c, pos_c = qs._simulate_label_rows_collapse(
        virt, frag, jnp.asarray(lab), seed=3
    )
    assert pos_c == pos_e
    mean = np.asarray(rows_c, np.float64).mean(axis=0)
    se = np.asarray(rows_c, np.float64).std(axis=0) / math.sqrt(K)
    assert np.all(np.abs(mean - exact) <= 5 * se + 1e-4)


@pytest.mark.parametrize("n,keep", [(6, [0, 1])])
def test_sampled_knit_collapse_matches_oracle(n, keep):
    circ = _prepped_qft(n)
    virt = _gamma_cut(circ, n)
    oracle = _oracle_marginal(circ, n, keep)
    est, se = qs.sampled_knit(
        virt, 20000, seed=1, keep_clbits=keep, with_stderr=True,
        method="lhs", control_variate=True, collapse=True,
    )
    err = np.abs(np.asarray(est.values, np.float64) - oracle)
    assert float(err.max()) <= max(5 * float(se.max()), 1e-3)
    assert float(se.max()) < 0.05


def test_auto_collapse_triggers_on_wide_ancilla_fragments():
    """qft-10's 9|1 gamma plan: the lone-qubit fragment has 1 data + 9
    ancilla sim qubits -> auto collapse; pipeline still matches the
    oracle."""
    circ = _prepped_qft(10, seed=9)
    virt = _gamma_cut(circ, 10)
    flags = qs._collapse_flags(virt, "auto")
    by_name = {
        reg.name: virt.programs[reg.name] for reg in virt.fragments
    }
    assert any(flags), (flags, {
        k: (p.num_data_qubits, p.num_sim_qubits)
        for k, p in by_name.items()
    })
    oracle = _oracle_marginal(circ, 10, [0, 1])
    est, se = qs.sampled_knit(
        virt, 12000, seed=4, keep_clbits=[0, 1], with_stderr=True,
        method="lhs", control_variate=True,
    )
    err = np.abs(np.asarray(est.values, np.float64) - oracle)
    assert float(err.max()) <= max(5 * float(se.max()), 2e-3)


def test_scan_core_equals_unblocked(monkeypatch):
    """Forcing tiny blocks routes through _scan_core; results must match
    the unblocked path (same seeds -> same collapse draws) to float
    tolerance, including stderr and control-variate statistics."""
    circ = _prepped_qft(6, seed=11)
    virt = _gamma_cut(circ, 6)
    keep = [0, 1, 2]
    args = dict(seed=2, keep_clbits=keep, with_stderr=True,
                method="lhs", control_variate=True)
    for coll in (False, True):
        e0, s0 = qs.sampled_knit(virt, 4000, collapse=coll, **args)
        monkeypatch.setattr(qs, "_label_budget", lambda: 1 << 9)
        e1, s1 = qs.sampled_knit(virt, 4000, collapse=coll, **args)
        monkeypatch.undo()
        np.testing.assert_allclose(
            np.asarray(e0.values), np.asarray(e1.values),
            atol=5e-5, rtol=1e-3,
        )
        np.testing.assert_allclose(
            np.asarray(s0), np.asarray(s1), atol=5e-5, rtol=1e-2,
        )
    # observable twin
    zs = [{0}, {0, 1, 2}]
    z0, t0 = qs.sampled_expectation_z(
        virt, zs, 4000, seed=2, method="lhs", with_stderr=True,
        control_variate=True, collapse=True,
    )
    monkeypatch.setattr(qs, "_label_budget", lambda: 1 << 9)
    z1, t1 = qs.sampled_expectation_z(
        virt, zs, 4000, seed=2, method="lhs", with_stderr=True,
        control_variate=True, collapse=True,
    )
    np.testing.assert_allclose(z0, z1, atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(t0, t1, atol=5e-5, rtol=1e-2)


def test_collapse_rejects_noise():
    circ = _prepped_qft(4)
    virt = _gamma_cut(circ, 4)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
    )

    with pytest.raises(ValueError, match="exact-path only"):
        qs.sampled_knit(virt, 100, noise=NoiseModel(p1=0.01),
                        collapse=True)
