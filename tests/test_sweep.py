"""Parameter sweep: one compile, many parameter bindings."""
import numpy as np
import pytest

import jax

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    Distribution,
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
    make_parameter_sweep,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)

N = 5


def _ansatz(thetas):
    circ = Circuit(N, N)
    for q in range(N):
        circ.ry(float(thetas[q]), q)
    for i in range(N - 1):
        circ.cx(i, i + 1)
    circ.rzz(float(thetas[N]), 0, N - 1)  # parameterised cut candidate
    for q in range(N):
        circ.ry(float(thetas[N + 1 + q]), q)
    for q in range(N):
        circ.measure(q, q)
    return circ


def _cut(circ):
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=3,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def test_sweep_matches_fresh_runs_single_compile():
    rng = np.random.default_rng(13)
    theta_sets = [rng.standard_normal(2 * N + 1) for _ in range(3)]

    template_virt = _cut(_ansatz(theta_sets[0]))
    runner, bind = make_parameter_sweep(template_virt)
    jitted = jax.jit(runner)

    for thetas in theta_sets:
        circ = _ansatz(thetas)
        virt = _cut(circ)
        args = bind(virt)
        vals = np.asarray(jitted(args))
        got = Distribution(
            vals, sorted(range(N)), virt.num_clbits
        )
        want, _ = run_virtual_circuit(virt, project=False)
        np.testing.assert_allclose(
            vals, np.asarray(want.values), atol=3e-6
        )
        fid = hellinger_fidelity(simulate_circuit(circ), got)
        assert fid > 1 - 1e-5, fid

    # the whole point: one traced/compiled program served every binding
    assert jitted._cache_size() == 1


def test_bind_rejects_structure_mismatch():
    template_virt = _cut(_ansatz(np.zeros(2 * N + 1)))
    runner, bind = make_parameter_sweep(template_virt)

    other = Circuit(N, N)
    other.h(0)
    for i in range(N - 1):
        other.cx(i, i + 1)
    other.cz(0, N - 1)
    for q in range(N):
        other.measure(q, q)
    with pytest.raises(ValueError):
        bind(_cut(other))
