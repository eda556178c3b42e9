"""Tracer phase timing + fragment-result checkpoint/resume."""
import json

import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.checkpoint import (
    has_checkpoint,
    load_fragment_results,
    save_fragment_results,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.profiling import (
    Tracer,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)


def _cut_ghz(n=4, cap=3):
    circ = Circuit(n, n)
    circ.h(0)
    for i in range(n - 1):
        circ.cx(i, i + 1)
    for q in range(n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return circ, cutter.getResultCircs()[3]


def test_tracer_collects_phases(tmp_path):
    _, cut = _cut_ghz()
    tracer = Tracer()
    dist, info = run_virtual_circuit(VirtualCircuit(cut), tracer=tracer)
    names = [p.name for p in tracer.phases]
    assert "simulate" in names and "knit" in names and "project" in names
    assert tracer.total("simulate") > 0
    out = tmp_path / "phases.json"
    tracer.save(out)
    report = json.loads(out.read_text())
    assert report["total_seconds"] > 0
    assert any(p["name"] == "simulate" and p["instances"] > 1
               for p in report["phases"])
    assert "simulate" in str(tracer)


def test_checkpoint_roundtrip(tmp_path):
    _, cut = _cut_ghz()
    virt = VirtualCircuit(cut)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        run_all_fragments,
    )

    results = run_all_fragments(virt)
    d = save_fragment_results(results, tmp_path / "ckpt")
    assert has_checkpoint(d)
    loaded = load_fragment_results(d)
    assert len(loaded) == len(results)
    for a, b in zip(results, loaded):
        assert a.name == b.name
        assert a.bit_positions == b.bit_positions
        assert a.touching == b.touching
        np.testing.assert_allclose(a.values, b.values, rtol=1e-6)


def test_resume_skips_simulation(tmp_path):
    orig, cut = _cut_ghz()
    ckpt = tmp_path / "ckpt"
    t1 = Tracer()
    d1, _ = run_virtual_circuit(
        VirtualCircuit(cut), tracer=t1, checkpoint_dir=ckpt
    )
    assert has_checkpoint(ckpt)
    assert any(p.name == "save_checkpoint" for p in t1.phases)

    t2 = Tracer()
    d2, _ = run_virtual_circuit(
        VirtualCircuit(cut), tracer=t2, checkpoint_dir=ckpt
    )
    names = [p.name for p in t2.phases]
    assert "load_checkpoint" in names and "simulate" not in names
    np.testing.assert_allclose(
        np.asarray(d1.values), np.asarray(d2.values), atol=1e-6
    )


def test_save_circuit_png(tmp_path):
    """PNG renderer handles every construct (1q/2q/vgate/c_if/barrier/
    measure) without error and writes a real file."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
        Instruction,
        Register,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.artifacts import (
        save_circuit_png,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
        VirtualGateOp,
    )

    c = Circuit([Register("frag0", 2), Register("frag1", 2)], 4)
    c.h(0)
    c.rz(0.5, 1)
    c.cx(0, 1)
    c.cz(2, 3)
    c.append(Instruction("vgate", [1, 2], op=VirtualGateOp("rzz", (0.3,))))
    c.barrier()
    c.measure(0, 0)
    c.append(Instruction("x", [3], condition=(0, 1)))
    for q in range(1, 4):
        c.measure(q, q)
    ok = save_circuit_png(c, tmp_path, "render_check")
    if not ok:
        import pytest

        pytest.skip("matplotlib unavailable")
    out = tmp_path / "render_check.png"
    assert out.exists() and out.stat().st_size > 2000


def test_save_dag_png(tmp_path):
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.artifacts import (
        save_dag_png,
    )

    ok = save_dag_png(genCirc("ghz", 5, 1), tmp_path, "dag_check")
    if not ok:
        import pytest

        pytest.skip("matplotlib unavailable")
    out = tmp_path / "dag_check.png"
    assert out.exists() and out.stat().st_size > 2000
