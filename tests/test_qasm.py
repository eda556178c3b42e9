"""OpenQASM 2.0 bridge tests: import semantics and export round-trips."""
import math

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    Instruction,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.qasm import (
    from_qasm,
    to_qasm,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)


def _dist(circ):
    d = simulate_circuit(circ)
    return np.asarray(d.values), list(d.bit_positions)


def test_parse_basics_broadcast_and_defs():
    src = """
    OPENQASM 2.0;
    include "qelib1.inc";
    // a comment; with a semicolon
    gate bell a,b { h a; cx a,b; }
    gate tilt(theta) a { ry(theta/2) a; rz(-theta) a; }
    qreg q[3];
    creg c[3];
    bell q[0],q[1];
    tilt(pi/2) q[2];
    x q;            // broadcast over the whole register
    barrier q;
    measure q -> c;
    """
    circ = from_qasm(src)
    assert circ.num_qubits == 3 and circ.num_clbits == 3
    names = [i.name for i in circ.instructions]
    assert names == ["h", "cx", "ry", "rz", "x", "x", "x", "barrier",
                     "measure", "measure", "measure"]
    ry_ins = circ.instructions[2]
    assert ry_ins.params == [pytest.approx(math.pi / 4)]
    assert circ.instructions[3].params == [pytest.approx(-math.pi / 2)]
    # broadcast measure maps q[i] -> c[i]
    assert [i.clbits[0] for i in circ.instructions[-3:]] == [0, 1, 2]


def test_parse_condition_and_errors():
    src = """
    OPENQASM 2.0;
    qreg q[2]; creg m[1]; creg c[2];
    h q[0];
    measure q[0] -> m[0];
    if (m==1) x q[1];
    measure q[1] -> c[1];
    """
    circ = from_qasm(src)
    cond = [i for i in circ.instructions if i.condition is not None]
    assert len(cond) == 1 and cond[0].condition == (0, 1)

    with pytest.raises(ValueError, match="single-bit"):
        from_qasm("qreg q[1]; creg c[2]; if (c==1) x q[0];")
    with pytest.raises(ValueError, match="not supported"):
        from_qasm("qreg q[2]; mystery q[0],q[1];")
    with pytest.raises(ValueError, match="opaque"):
        from_qasm("qreg q[1]; opaque magic q;")


@pytest.mark.parametrize(
    "name,n,depth",
    [("ghz", 5, 1), ("hwe", 4, 1), ("bv", 4, 1), ("qft", 4, 1),
     ("add", 6, 1), ("syc", 4, 1), ("su", 4, 0)],
)
def test_zoo_roundtrip(name, n, depth):
    """to_qasm -> from_qasm preserves the measured distribution exactly."""
    circ = genCirc(name, n, depth, seed=3)
    back = from_qasm(to_qasm(circ))
    assert back.num_qubits == circ.num_qubits
    v0, p0 = _dist(circ)
    v1, p1 = _dist(back)
    assert p0 == p1
    np.testing.assert_allclose(v1, v0, atol=1e-5)


def test_export_defs_roundtrip():
    """Gates with no qelib1 spelling (sx/sxdg/iswap/fsim) export as local
    definitions; the round-trip checks those decompositions are exact up
    to global phase (relative phases are exercised by the surrounding
    rotations)."""
    c = Circuit(2, 2)
    c.ry(0.7, 0)
    c.ry(1.1, 1)
    c.sx(0)
    c.append(Instruction("sxdg", [1]))
    c.iswap(0, 1)
    c.fsim(0.4, 0.9, 0, 1)
    c.rx(0.3, 0)
    c.measure(0, 0)
    c.measure(1, 1)
    qasm = to_qasm(c)
    assert "gate fsim" in qasm and "gate iswap" in qasm
    back = from_qasm(qasm)
    v0, _ = _dist(c)
    v1, _ = _dist(back)
    np.testing.assert_allclose(v1, v0, atol=1e-5)


def test_export_rejects_cut_circuits():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )

    circ = genCirc("ghz", 4, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=3, maxNCuts=3, maxCutsPerPartitions=3)
    assert cutter.solve()
    cut = cutter.getResultCircs()[3]
    with pytest.raises(ValueError, match="not representable"):
        to_qasm(cut)
    # but every per-fragment instantiation IS plain and exports fine
    text = to_qasm(circ)
    assert text.startswith("OPENQASM 2.0;")


def test_qelib1_supplement_gates_exact():
    """ch/crx/cry/csx/cswap/rxx/ryy/cu3/cu expand to exact unitaries —
    checked against numpy-built references on the full statevector (via
    measured distributions after symmetry-breaking rotations)."""
    H = np.array([[1, 1], [1, -1]]) / np.sqrt(2)
    SXm = 0.5 * np.array([[1 + 1j, 1 - 1j], [1 - 1j, 1 + 1j]])

    def ctrl(u):
        out = np.eye(4, dtype=complex)
        out[2:, 2:] = u
        return out

    def u3(t, p, l):
        c, s = math.cos(t / 2), math.sin(t / 2)
        return np.array(
            [[c, -np.exp(1j * l) * s],
             [np.exp(1j * p) * s, np.exp(1j * (p + l)) * c]]
        )

    def rot(axis, t):
        c, s = math.cos(t / 2), math.sin(t / 2)
        if axis == "x":
            return np.array([[c, -1j * s], [-1j * s, c]])
        return np.array([[c, -s], [s, c]])

    th, ph, lam, gam = 0.7, 0.4, 1.1, 0.9
    two_q = {
        "ch a,b": ctrl(H),
        f"crx({th}) a,b": ctrl(rot("x", th)),
        f"cry({th}) a,b": ctrl(rot("y", th)),
        "csx a,b": ctrl(SXm),
        f"cu3({th},{ph},{lam}) a,b": ctrl(u3(th, ph, lam)),
        f"cu({th},{ph},{lam},{gam}) a,b": ctrl(np.exp(1j * gam) * u3(th, ph, lam)),
    }
    XX = np.kron([[0, 1], [1, 0]], [[0, 1], [1, 0]]).astype(complex)
    YY = np.kron([[0, -1j], [1j, 0]], [[0, -1j], [1j, 0]]).astype(complex)
    # XX^2 = YY^2 = I, so expm(-i t/2 P) = cos(t/2) I - i sin(t/2) P
    I4 = np.eye(4, dtype=complex)
    two_q[f"rxx({th}) a,b"] = np.cos(th / 2) * I4 - 1j * np.sin(th / 2) * XX
    two_q[f"ryy({th}) a,b"] = np.cos(th / 2) * I4 - 1j * np.sin(th / 2) * YY

    for stmt, want_u in two_q.items():
        name = stmt.split("(")[0].split()[0]
        src = (
            "OPENQASM 2.0;\nqreg q[2];\ncreg c[2];\n"
            "ry(0.9) q[0]; ry(0.4) q[1]; rz(0.5) q[1];\n"
            + stmt.replace("a,b", "q[0],q[1]") + ";\n"
            "ry(1.3) q[0]; rx(0.2) q[1];\n"
            "measure q -> c;\n"
        )
        circ = from_qasm(src)
        got = simulate_circuit(circ)
        # numpy oracle with the same surrounding rotations (q0 = MSB)
        psi = np.zeros(4, complex)
        psi[0] = 1.0
        psi = np.kron(rot("y", 0.9), np.eye(2)) @ psi
        psi = np.kron(np.eye(2), rot("y", 0.4)) @ psi
        rz = np.diag([np.exp(-0.25j), np.exp(0.25j)])
        psi = np.kron(np.eye(2), rz) @ psi
        psi = want_u @ psi
        psi = np.kron(rot("y", 1.3), np.eye(2)) @ psi
        psi = np.kron(np.eye(2), rot("x", 0.2)) @ psi
        probs = np.abs(psi) ** 2
        # big-endian oracle -> little-endian Distribution
        probs = probs.reshape(2, 2).T.reshape(4)
        np.testing.assert_allclose(
            np.asarray(got.values), probs, atol=1e-5, err_msg=name
        )

    # cswap (3q): |1>|10> -> |1>|01>
    src = (
        "OPENQASM 2.0;\nqreg q[3];\ncreg c[3];\n"
        "x q[0]; x q[1];\ncswap q[0],q[1],q[2];\nmeasure q -> c;\n"
    )
    d = simulate_circuit(from_qasm(src)).to_dict()
    # q0=1, q1->0, q2->1: little-endian key = 1 + 4 = 5
    assert d.get(5, 0) == pytest.approx(1.0, abs=1e-6)


def test_cref_bounds_checked():
    with pytest.raises(ValueError, match="clbit index out of range"):
        from_qasm(
            "qreg q[1]; creg a[2]; creg b[2]; measure q[0] -> a[3];"
        )


def test_circuit_convenience_methods():
    c = genCirc("ghz", 4, 1)
    back = Circuit.from_qasm(c.to_qasm())
    v0, _ = _dist(c)
    v1, _ = _dist(back)
    np.testing.assert_allclose(v1, v0, atol=1e-6)
