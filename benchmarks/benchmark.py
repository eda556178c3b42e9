"""End-to-end cut-search benchmark CLI.

Grammar-compatible with the reference driver (benchmarks/benchmark.py:22-29):

    python benchmarks/benchmark.py -p 2 -q 10 \
        [ran|sup|su|ghz|syc|hwe|bv|qft|aqft|add|erd] <nQubits> <nDepth>

Pipeline: generate circuit -> optimal cut search -> artifact directory
(circuit drawings, serialized cut plan, metrics JSON) -> optionally a full
QPD simulation + knit + fidelity comparison (disabled by default, matching
the reference's CUT_ONLY switch).
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time
from dataclasses import dataclass

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E402
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils import (  # noqa: E402
    artifacts,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (  # noqa: E402
    configure_loggers,
    get_logger,
)


@dataclass
class BenchConfig:
    max_partitions: int = 2
    max_qubits_per_partition: int = 10
    circuit: str = "ghz"
    n_qubits: int = 5
    depth: int = 1
    cut_only: bool = True
    shots: int = 1000
    results_root: str = "./benchmark_results"
    save_png: bool = False

    @property
    def tag(self) -> str:
        return (
            f"{self.circuit}_{self.n_qubits}_{self.depth}_"
            f"{self.max_partitions}_{self.max_qubits_per_partition}"
        )


def parse_args(argv: list[str]) -> BenchConfig:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-p", type=int, default=2, dest="partitions")
    ap.add_argument("-q", type=int, default=10, dest="qubits")
    ap.add_argument("circuit", nargs="?", default="ghz")
    ap.add_argument("n_qubits", nargs="?", type=int, default=5)
    ap.add_argument("depth", nargs="?", type=int, default=1)
    ap.add_argument("--simulate", action="store_true",
                    help="run the fidelity comparison (disables CUT_ONLY)")
    ap.add_argument("--shots", type=int, default=1000)
    ap.add_argument("--png", action="store_true",
                    help="also render circuit PNGs (the reference saves mpl "
                         "drawings by default — its #5 hot loop — so ours "
                         "are opt-in)")
    ap.add_argument("--results-dir", default="./benchmark_results",
                    help="root directory for per-run artifact folders")
    ns = ap.parse_args(argv)
    return BenchConfig(
        max_partitions=ns.partitions,
        max_qubits_per_partition=ns.qubits,
        circuit=ns.circuit.lower(),
        n_qubits=ns.n_qubits,
        depth=ns.depth,
        cut_only=not ns.simulate,
        shots=ns.shots,
        results_root=ns.results_dir,
        save_png=ns.png,
    )


def run_benchmark(cfg: BenchConfig) -> int:
    run_dir = artifacts.make_run_dir(cfg.results_root, cfg.tag)
    configure_loggers(run_dir / "run.log")
    log = get_logger()

    source_circuit = genCirc(cfg.circuit, cfg.n_qubits, cfg.depth)
    cutter = Cutter(
        inputCirc=source_circuit,
        maxNPartitions=cfg.max_partitions,
        maxNQubitsPerPartition=cfg.max_qubits_per_partition,
        maxNQpdCuts=5,
        maxNCuts=5,
        maxCutsPerPartitions=5,
    )

    t0 = time.perf_counter()
    log.info("solving STARTED")
    found = cutter.solve()
    solve_seconds = time.perf_counter() - t0
    log.info(f"solving DONE in {solve_seconds:.3f}s; success => {found}")
    if not found:
        return 0

    stages = cutter.getResultCircs(getInstantiations=True)
    decomposed, marked, marked_with_moves, cut_circuit, instantiations = stages
    S, A, L, n_wire, n_gate, Q, Q_p, C, C_p = cutter.getModelKeyResults()

    summary = {
        "S": S, "A": A, "L": L, "Q": Q, "C": C,
        "nWireCuts": n_wire, "nGateCuts": n_gate,
        "Q_p": Q_p, "C_p": C_p, "solve_seconds": solve_seconds,
    }
    for key, value in summary.items():
        log.info(f"{key}: {value}")
    cutter.logOptimizerResults()

    for name, circ in (
        ("1_decomposedCirc", decomposed),
        ("2_markedCirc", marked),
        ("3_markedCircWithVirtualMoves", marked_with_moves),
        ("4_cutCirc", cut_circuit),
    ):
        artifacts.save_circuit(circ, run_dir, name)
        if cfg.save_png:
            artifacts.save_circuit_png(circ, run_dir, name)
    if cfg.save_png:
        artifacts.save_dag_png(cut_circuit, run_dir, "4_cutCirc_dag")
    cutter.save_plan(run_dir / "cut_plan.json")
    artifacts.save_metrics(run_dir, summary)

    saved = 0
    for frag_idx, variant_circuits in enumerate(instantiations):
        for var_idx, variant in enumerate(variant_circuits):
            artifacts.save_circuit(
                variant, run_dir / "instantiations", f"{frag_idx}_{var_idx}"
            )
            if cfg.save_png:
                artifacts.save_circuit_png(
                    variant, run_dir / "instantiations",
                    f"{frag_idx}_{var_idx}",
                )
            saved += 1
    log.info(f"{saved} instantiations are saved to disk")

    if cfg.cut_only:
        log.info("cut-only mode: skipping simulation")
        return 0

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        compare_original_with_cut,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        fake_kolkata_v2,
    )

    # FakeKolkataV2 with the reference's actual run semantics (circuits
    # reach the backend untranspiled — reference benchmark.py:95,
    # qvm/run.py:40-43); see NOISY_TABLE.md for the recorded parity table
    backend = fake_kolkata_v2()
    backend.untranspiled = True
    res = compare_original_with_cut(
        decomposed, cut_circuit,
        noise_model=backend, shots=cfg.shots,
    )
    log.info(f"inputCircFidelity: {res.input_fidelity}")
    log.info(f"cutCircFidelity: {res.cut_fidelity}")
    log.info(f"cutVsUncutFidelity: {res.cut_vs_uncut_fidelity}")
    summary.update(
        inputCircFidelity=res.input_fidelity,
        cutCircFidelity=res.cut_fidelity,
        cutVsUncutFidelity=res.cut_vs_uncut_fidelity,
    )
    artifacts.save_metrics(run_dir, summary)
    return 0


if __name__ == "__main__":
    sys.exit(run_benchmark(parse_args(sys.argv[1:])))
