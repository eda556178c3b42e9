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
