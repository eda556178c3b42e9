"""Locks for the round-5 advisor fixes (ADVICE.md r4).

1. (medium) Collapse-mode stratified heads are one-draw stochastic
   estimates — the returned stderr must carry their collapse noise
   instead of treating the head as exact (previously reported ZERO when
   the head covered the whole grid).
2. (low) mesh= (dp-sharded sampled scan) combined with noise= used to be
   silently ignored; now a ValueError.
3. (low) engine="pallas" / sample_pallas opt-ins that route zero
   fragments through the VMEM kernel now emit a runtime signal
   (meta["pallas_fragments"] + a warning log).
"""
import logging
import math

import numpy as np
import pytest

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
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _prepped_qft(n, seed=5):
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
    v = probs.reshape([2] * n)
    marg = v.sum(axis=tuple(
        a for a in range(n) if (n - 1 - a) not in keep
    ))
    desc = sorted(keep, reverse=True)
    out = np.empty(1 << len(keep))
    for i, val in enumerate(marg.reshape(-1)):
        idx = 0
        for j, c in enumerate(desc):
            if (i >> (len(desc) - 1 - j)) & 1:
                idx |= 1 << keep.index(c)
        out[idx] = val
    return out


def test_collapse_head_stderr_nonzero_and_brackets_error():
    """Full-grid head (gamma_tail == 0) in collapse mode: the stderr
    used to be reported as exactly zero while the estimate carried
    collapse-draw noise.  Now it must be nonzero and bracket the true
    error."""
    n, keep = 6, [0, 1]
    circ = _prepped_qft(n)
    virt = _gamma_cut(circ, n)
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    est, se = qs.sampled_knit(
        virt, 4000, seed=3, keep_clbits=keep, with_stderr=True,
        head_labels=total, collapse=True,
    )
    se = np.asarray(se, np.float64)
    assert float(se.max()) > 0.0, (
        "collapse-mode head stderr reported as zero (advisor r4 medium)"
    )
    oracle = _oracle_marginal(circ, n, keep)
    err = np.abs(np.asarray(est.values, np.float64) - oracle)
    assert float(err.max()) <= max(6 * float(se.max()), 1e-3)
    # the z twin too
    zs = [{0}, {0, 1}]
    zvals, zse = qs.sampled_expectation_z(
        virt, zs, 4000, seed=3, with_stderr=True,
        head_labels=total, collapse=True,
    )
    assert float(np.asarray(zse).max()) > 0.0


def test_collapse_head_stderr_calibrated():
    """Across seeds, the reported stderr must be the right scale: the
    observed |err| exceeds 3x stderr in at most a small fraction of
    (seed, outcome) cells (it was understated by construction before:
    head variance omitted entirely)."""
    n, keep = 6, [0, 1]
    circ = _prepped_qft(n)
    virt = _gamma_cut(circ, n)
    total = 1
    for vg in virt.vgates:
        total *= vg.spec.num_instantiations
    oracle = _oracle_marginal(circ, n, keep)
    bad = cells = 0
    for seed in range(5):
        est, se = qs.sampled_knit(
            virt, 3000, seed=seed, keep_clbits=keep, with_stderr=True,
            head_labels=total, collapse=True,
        )
        err = np.abs(np.asarray(est.values, np.float64) - oracle)
        se = np.maximum(np.asarray(se, np.float64), 1e-12)
        bad += int((err > 3.0 * se + 1e-4).sum())
        cells += err.size
    assert bad <= max(1, cells // 10), (bad, cells)


def test_collapse_head_plus_tail_stderr_includes_head_noise():
    """Stratified head + sampled tail in collapse mode: stderr must be
    >= the tail-only formula (the head term adds in quadrature) and the
    estimate must still bracket the oracle."""
    n, keep = 6, [0, 1]
    circ = _prepped_qft(n, seed=7)
    virt = _gamma_cut(circ, n)
    oracle = _oracle_marginal(circ, n, keep)
    est, se = qs.sampled_knit(
        virt, 6000, seed=2, keep_clbits=keep, with_stderr=True,
        head_labels=64, collapse=True, method="lhs",
    )
    err = np.abs(np.asarray(est.values, np.float64) - oracle)
    assert float(err.max()) <= max(6 * float(np.asarray(se).max()), 2e-3)


def test_mesh_and_noise_are_exclusive():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        NoiseModel,
    )

    circ = _prepped_qft(4)
    virt = _gamma_cut(circ, 4)

    class _FakeMesh:  # never reached: the check precedes any mesh use
        shape = {"dp": 2}

    with pytest.raises(ValueError, match="exclusive"):
        qs.sampled_knit(virt, 100, noise=NoiseModel(p1=0.01),
                        collapse=False, mesh=_FakeMesh())
    with pytest.raises(ValueError, match="exclusive"):
        qs.sampled_expectation_z(virt, [{0}], 100,
                                 noise=NoiseModel(p1=0.01),
                                 collapse=False, mesh=_FakeMesh())


class _Capture(logging.Handler):
    def __init__(self):
        super().__init__(level=logging.INFO)
        self.records = []

    def emit(self, record):
        self.records.append(record)


def _captured(fn):
    """The app logger does not propagate to root (singleton config), so
    caplog misses it — attach a handler directly."""
    log = logging.getLogger("HwAwareCutterTPU")
    h = _Capture()
    old = log.level
    log.addHandler(h)
    log.setLevel(logging.INFO)
    try:
        out = fn()
    finally:
        log.removeHandler(h)
        log.setLevel(old)
    return out, " ".join(r.getMessage() for r in h.records)


def test_pallas_optin_signals_zero_routed_fragments():
    """A 4-qubit circuit's fragments are below the kernel's 8-qubit
    width gate: engine='pallas' must say so instead of silently running
    the XLA sim."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    circ = _prepped_qft(4)
    virt = _gamma_cut(circ, 4)
    (_, _, meta), text = _captured(
        lambda: make_streamed_knit(virt, chunk=64, pallas_variant=True)
    )
    assert "pallas_fragments" in meta
    assert not any(meta["pallas_fragments"].values())
    assert "no effect" in text or "NO fragment" in text, text


def test_sample_pallas_signals_zero_routed_fragments():
    circ = _prepped_qft(4)
    virt = _gamma_cut(circ, 4)
    import unittest.mock as mock

    def run():
        # force the blocked scan (where the builders are picked)
        with mock.patch.object(qs, "_label_budget", lambda: 1 << 6):
            return qs.sampled_knit(virt, 500, seed=1, collapse=True,
                                   pallas_variant=True,
                                   keep_clbits=[0, 1])

    _, text = _captured(run)
    assert "sample_pallas" in text, text
