"""Circuit zoo tests: generator shapes, gate inventories, and known output
distributions."""
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    factor_int,
    gen_secret,
    genCirc,
    generate_circ,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)


@pytest.mark.parametrize(
    "name,n,depth",
    [
        ("ghz", 5, 1),
        ("bv", 5, 1),
        ("qft", 5, 1),
        ("aqft", 6, 1),
        ("hwe", 5, 1),
        ("sup", 6, 1),
        ("syc", 6, 1),
        ("add", 6, 1),
        ("su", 4, 0),
        ("ran", 4, 3),
        ("erd", 5, 1),
    ],
)
def test_genCirc_shapes(name, n, depth):
    circ = genCirc(name, n, depth)
    assert circ.num_qubits in (n, n + 1)  # bv may carry its ancilla as +1
    ops = circ.count_ops()
    assert ops.get("measure", 0) == circ.num_qubits  # measure_all
    # every 2q gate must be a simulable gate name
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.gates import (
        GATE_ARITY,
    )
    for ins in circ.instructions:
        assert ins.name in GATE_ARITY


def test_bv_finds_secret():
    circ = genCirc("bv", 5, 1)
    d = simulate_circuit(circ).to_dict(1e-6)
    # secret = 1111 on qubits 0..3; ancilla ends in |1> basis state minus...
    # after final H the ancilla is in |-> so measures 0/1 uniformly; the data
    # qubits must always spell the secret.
    secret = int(gen_secret(5), 2)
    for key in d:
        assert key & 0b1111 == secret


def test_ghz_distribution():
    circ = genCirc("ghz", 4, 1)
    d = simulate_circuit(circ).to_dict(1e-6)
    # 2n clbits: first n are the unused original creg (always 0); the meas
    # register holds the GHZ pattern
    assert set(d) == {0, 0b1111 << 4}


def test_qft_gate_inventory():
    circ = generate_circ(5, 1, "qft")
    ops = circ.count_ops()
    assert ops["h"] == 5
    assert ops["cp"] == 10  # n(n-1)/2


def test_aqft_has_fewer_rotations():
    full = generate_circ(8, 1, "qft").count_ops()["cp"]
    approx = generate_circ(8, 1, "aqft").count_ops()["cp"]
    assert approx < full


def test_factor_int_and_secret():
    assert factor_int(12) == (4, 3)
    assert factor_int(25) == (5, 5)
    assert gen_secret(5) == "1111"


def test_supremacy_dims():
    circ = generate_circ(12, 1, "supremacy")
    assert circ.num_qubits == 12
    assert circ.count_ops().get("cz", 0) > 0


def test_genCirc_seed_reproducible():
    """seed= pins the random 1q-gate draws of sup/syc instances (ours
    only; the reference draws fresh instances per call and averages)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )

    a = genCirc("sup", 12, 1, seed=7)
    b = genCirc("sup", 12, 1, seed=7)
    c = genCirc("sup", 12, 1, seed=8)
    sig = lambda circ: [
        (i.name, tuple(i.qubits), tuple(getattr(i, "params", ()) or ()))
        for i in circ.instructions
    ]
    assert sig(a) == sig(b)
    assert sig(a) != sig(c)
