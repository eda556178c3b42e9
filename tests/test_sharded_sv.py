"""Amplitude-sharded statevector engine vs the single-device oracle.

Runs in subprocesses (virtual multi-device CPU platform must be configured
before backend init; see tests/test_multichip.py)."""
import pytest

from conftest import run_cpu_subprocess as _run


_CHECK = """
import numpy as np
import jax
from jax.sharding import Mesh
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    compile_circuit, simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sharded_sv import (
    sharded_probabilities,
)

circ = {builder}
mesh = Mesh(np.array(jax.devices()[:{n}]), ("amp",))
got = sharded_probabilities(compile_circuit(circ), mesh)
want = simulate_circuit(circ)
assert got.bit_positions == want.bit_positions, (got.bit_positions, want.bit_positions)
err = float(np.max(np.abs(np.asarray(got.values) - np.asarray(want.values))))
assert err < 1e-5, err
print("MAXERR", err)
"""


def _code_with_builder(lines: str, n_dev: int) -> str:
    # embed a multi-line builder by exec-ing it into `circ`
    builder = f"(lambda: (exec({lines!r}, globals()), circ)[1])()"
    return _CHECK.format(builder=builder, n=n_dev)


@pytest.mark.slow
def test_ghz_chain_8dev():
    lines = "\n".join([
        "from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit",
        "circ = Circuit(6, 6)",
        "circ.h(0)",
        "ignore = [circ.cx(i, i + 1) for i in range(5)]",
        "circ.t(0)",
        "circ.cz(0, 5)",
        "circ.rz(0.3, 1)",
        "ignore2 = [circ.measure(q, q) for q in range(6)]",
    ])
    out = _run(_code_with_builder(lines, 8), 8)
    assert "MAXERR" in out


@pytest.mark.slow
def test_mid_circuit_measure_4dev():
    # deferred-measurement ancillas live above the circuit qubits (local),
    # gates hit global qubits 0 and 1
    lines = "\n".join([
        "from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit",
        "import numpy as np",
        "circ = Circuit(3, 4)",
        "circ.h(0)",
        "circ.cx(0, 1)",
        "circ.measure(0, 3)",   # mid-circuit: ancilla CX
        "circ.h(0)",
        "circ.ry(0.7, 2)",
        "circ.cx(1, 2)",
        "ignore = [circ.measure(q, q) for q in range(3)]",
    ])
    out = _run(_code_with_builder(lines, 4), 4)
    assert "MAXERR" in out


@pytest.mark.slow
def test_random_2q_layers_8dev():
    lines = "\n".join([
        "from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit",
        "import numpy as np",
        "rng = np.random.default_rng(3)",
        "circ = Circuit(5, 5)",
        "ignore = [circ.ry(float(rng.standard_normal()), q) for q in range(5)]",
        "pairs = [(0, 1), (2, 3), (1, 2), (3, 4), (0, 4), (1, 3)]",
        "ignore2 = [(circ.cx(a, b), circ.rz(float(rng.standard_normal()), b)) for a, b in pairs]",
        "ignore3 = [circ.measure(q, q) for q in range(5)]",
    ])
    out = _run(_code_with_builder(lines, 8), 8)
    assert "MAXERR" in out
