"""n-tangle entanglement measure (reference testhwea.py parity)."""
import numpy as np

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.hwea import (
    gen_hwea,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.entanglement import (
    circuit_n_tangle,
    n_tangle,
    sgn_star,
)


def _ghz_state(n):
    a = np.zeros(1 << n, complex)
    a[0] = a[-1] = 1 / np.sqrt(2)
    return a


def test_ghz_tangle_is_one():
    for n in (2, 4, 6):
        assert abs(n_tangle(_ghz_state(n), n) - 1.0) < 1e-12


def test_product_state_tangle_is_zero():
    a = np.zeros(1 << 4, complex)
    a[0] = 1.0
    assert n_tangle(a, 4) == 0.0


def test_w_state_tangle_is_zero():
    # the W state's n-tangle vanishes (it carries no GHZ-class
    # entanglement) — a classic discriminator the measure must show
    n = 4
    a = np.zeros(1 << n, complex)
    for q in range(n):
        a[1 << q] = 1 / np.sqrt(n)
    assert abs(n_tangle(a, n)) < 1e-12


def test_matches_scalar_formula_on_random_state():
    rng = np.random.default_rng(7)
    n = 6
    a = rng.normal(size=1 << n) + 1j * rng.normal(size=1 << n)
    a /= np.linalg.norm(a)
    # independent scalar evaluation of the published formula — signs
    # written out inline (NOT via sgn_star) so the vectorized sign table
    # is checked against a second implementation of the convention
    total = 0.0
    for i in range(1 << (n - 2)):
        ni = bin(i).count("1")
        s = (-1) ** ni if i < (1 << (n - 3)) else (-1) ** (n + ni)
        total += s * (
            a[2 * i] * a[(1 << n) - 1 - 2 * i]
            - a[2 * i + 1] * a[(1 << n) - 2 - 2 * i]
        )
    assert abs(n_tangle(a, n) - 2 * abs(total)) < 1e-12


def test_sgn_star_matches_inline_convention():
    for n in (4, 6, 8):
        i = np.arange(1 << (n - 2))
        vec = sgn_star(n, i)
        for j in (0, 1, (1 << (n - 3)) - 1, 1 << (n - 3), (1 << (n - 2)) - 1):
            ni = bin(int(j)).count("1")
            want = (-1) ** ni if j < (1 << (n - 3)) else (-1) ** (n + ni)
            assert int(vec[j]) == want, (n, j)


def test_odd_n_rejected():
    a = np.zeros(8, complex)
    a[0] = 1.0
    try:
        n_tangle(a, 3)
    except ValueError:
        return
    raise AssertionError("odd n must be rejected")


def _textbook_concurrence(a: np.ndarray) -> float:
    """Independent |<psi*| sigma_y^(x)n |psi>| (the n-concurrence;
    the reference's tau convention at testhwea.py:34-42 returns this
    un-squared quantity), evaluated directly from sigma_y matrix
    elements — no shared code with utils.entanglement's sgn*-table."""
    a = np.asarray(a, dtype=np.complex128)
    n = int(np.log2(a.size))
    idx = np.arange(a.size)
    pc = np.zeros_like(idx)
    v = idx.copy()
    while v.any():
        pc += v & 1
        v >>= 1
    # <~i| sigma_y^(x)n |i> = i^n (-1)^popcount(i), ~i the bit complement
    val = np.sum(a[a.size - 1 - idx] * a * (1j ** n) * ((-1.0) ** pc))
    return float(abs(val))


def test_hwea_circuit_flow():
    # the reference scratch's end-to-end flow: gen_hwea(6, 1) -> tau,
    # pinned against the textbook sigma_y^(x)n definition computed from
    # the same statevector (f32 engine => 1e-5 tolerance)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        compile_circuit,
        run_statevector,
    )

    circ = gen_hwea(6, 1)
    tau = circuit_n_tangle(circ)
    comp = compile_circuit(circ)
    raw = np.asarray(run_statevector(comp))
    assert abs(tau - _textbook_concurrence(raw[0] + 1j * raw[1])) < 1e-5


def test_partial_entanglement_pinned():
    # unequal-weight GHZ cos(a)|0000> + sin(a)|1111>: the measure equals
    # sin(2a), strictly inside (0, 1) — pins the scale AND the
    # reference's un-squared convention, not just the [0,1] range
    alpha = 0.35
    n = 4
    a = np.zeros(1 << n, complex)
    a[0] = np.cos(alpha)
    a[-1] = np.sin(alpha)
    tau = n_tangle(a, n)
    assert abs(tau - _textbook_concurrence(a)) < 1e-12
    assert abs(tau - np.sin(2 * alpha)) < 1e-12
    assert 0.05 < tau < 0.95


def test_real_rep_input():
    circ = Circuit(4, 0)
    circ.h(0)
    for i in range(3):
        circ.cx(i, i + 1)
    assert abs(circuit_n_tangle(circ) - 1.0) < 1e-6
