"""Typed pipeline config: round-trip and the cost-model knob."""
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.config import (
    CostModel,
    CutterConfig,
    ExecutionConfig,
    PipelineConfig,
    make_cutter,
)


def test_pipeline_config_json_round_trip():
    cfg = PipelineConfig(
        CutterConfig(
            max_n_partitions=3,
            max_n_qubits_per_partition=[4, 5, 6],
            force_n_wire_cuts=1,
            cost_model=CostModel(wire_qpd_overhead=16, tele_latency=7),
        ),
        ExecutionConfig(shots=500, engine="streamed", seed=9),
        cut_only=True,
        results_dir="/tmp/x",
    )
    back = PipelineConfig.from_json(cfg.to_json())
    assert back == cfg


def test_make_cutter_applies_cost_model():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
        Circuit,
    )

    circ = Circuit(3, 3)
    circ.cx(0, 1)
    circ.cx(1, 2)
    cutter = make_cutter(circ, CutterConfig(
        max_n_partitions=2, max_n_qubits_per_partition=2,
        cost_model=CostModel(gate_qpd_overhead=11, wire_qpd_overhead=13),
    ))
    assert cutter.cfg.gate_qpd_cost[0] == 11
    assert cutter.cfg.wire_qpd_cost[0] == 13
    # non-default costs must route to the Python solver twin
    assert not cutter.cfg.has_default_costs()
