"""Direct channel-identity checks of the QPD tables: for every virtual gate,
sum_v sum_b coef[v,b] * K_{v,b} rho K_{v,b}^dag  ==  U rho U^dag.

This is the mathematical core the knit correctness rests on
(reference tables: third_party/qvm/qvm/virtual_gates.py:58-310)."""
import math

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit import gates
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt import tables

P0 = np.diag([1.0, 0.0]).astype(complex)
P1 = np.diag([0.0, 1.0]).astype(complex)


def _branches(ev):
    if ev.measure:
        return [(0, ev.post @ P0 @ ev.pre), (1, ev.post @ P1 @ ev.pre)]
    return [(0, ev.post @ ev.pre)]


def channel(spec, rho):
    out = np.zeros_like(rho)
    for v, (e0, e1) in enumerate(spec.endpoints):
        for b0, k0 in _branches(e0):
            for b1, k1 in _branches(e1):
                kk = np.kron(k0, k1)
                out += spec.coef[v, b0 ^ b1] * (kk @ rho @ kk.conj().T)
    return out


def random_rho(seed):
    rng = np.random.default_rng(seed)
    psi = rng.normal(size=4) + 1j * rng.normal(size=4)
    psi /= np.linalg.norm(psi)
    return np.outer(psi, psi.conj())


@pytest.mark.parametrize(
    "spec,u",
    [
        (tables.cz_spec(), gates.CZ),
        (tables.cx_spec(), gates.CX),
        (tables.cy_spec(), gates.CY),
        (tables.rzz_spec(0.77), gates.rzz(0.77)),
        (tables.rzz_spec(-1.9), gates.rzz(-1.9)),
        (tables.rzz_spec(math.pi), gates.rzz(math.pi)),
        (tables.rzz_spec(0.0), gates.rzz(0.0)),
        (tables.cphase_spec(1.3), gates.cphase(1.3)),
        (tables.cphase_spec(-2.0), gates.cphase(-2.0)),
        (tables.cphase_spec(math.pi / 4), gates.cphase(math.pi / 4)),
    ],
)
def test_gate_channel_identity(spec, u):
    u = u.astype(complex)
    for seed in range(3):
        rho = random_rho(seed)
        got = channel(spec, rho)
        want = u @ rho @ u.conj().T
        assert np.abs(got - want).max() < 1e-6


def test_move_channel_identity():
    """VirtualMove: endpoint 1 starts in |0>; the channel must equal moving
    endpoint-0's state onto endpoint 1 (and endpoint 0's residual is traced
    out by the caller).  Check the marginal on endpoint 1."""
    spec = tables.move_spec()
    rng = np.random.default_rng(7)
    psi = rng.normal(size=2) + 1j * rng.normal(size=2)
    psi /= np.linalg.norm(psi)
    rho1 = np.outer(psi, psi.conj())
    rho = np.kron(rho1, np.diag([1.0, 0.0]).astype(complex))  # q1 = |0>
    got = channel(spec, rho)
    # trace out endpoint 0 (gate-local MSB)
    got4 = got.reshape(2, 2, 2, 2)  # (q0, q1, q0', q1')
    marg = got4[0, :, 0, :] + got4[1, :, 1, :]
    assert np.abs(marg - rho1).max() < 1e-6
