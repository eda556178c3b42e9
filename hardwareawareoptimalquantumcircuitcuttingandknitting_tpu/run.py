"""Execution runtime: run all fragments and knit.

Analog of the reference's ``run_virtual_circuit`` (qvm/run.py:23-71), with
the Aer job fan-out replaced by the batched variant engine and the Pool(8)
dict knit replaced by the einsum contraction.  ``shots=None`` selects the
exact path (probability tensors); an integer emulates the reference's
shot-sampled estimate.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

from .ops.knit import knit, nearest_probability_distribution
from .ops.statevector import Distribution
from .ops.variant_engine import run_all_fragments
from .utils.logger import get_logger
from .virt.virtual_circuit import VirtualCircuit


@dataclass
class RunTimeInfo:
    """Phase timings (reference: qvm/run.py:17-20, extended)."""

    run_time: float
    knit_time: float


def run_virtual_circuit(
    virt: VirtualCircuit,
    shots: int | None = None,
    chunk_size: int = 1024,
    seed: int = 0,
    project: bool = True,
) -> tuple[Distribution, RunTimeInfo]:
    log = get_logger(__name__)
    frag_sizes = tuple(p.num_data_qubits for p in virt.programs.values())
    log.info(
        f"Running virtualizer with {len(virt.fragments)} {frag_sizes} "
        f"fragments and {len(virt.vgates)} vgates..."
    )
    log.info(f"Running {virt.total_instantiations()} instances...")

    now = time.perf_counter()
    results = run_all_fragments(virt, chunk_size)
    if shots is not None:
        from .ops.sampling import sample_fragment_results

        results = sample_fragment_results(results, shots, seed)
    run_time = time.perf_counter() - now

    log.info("Knitting...")
    now = time.perf_counter()
    dist = knit(virt, results)
    knit_time = time.perf_counter() - now
    log.info(f"Knitted in {knit_time:.2f}s.")

    if project:
        dist = nearest_probability_distribution(dist)
    return dist, RunTimeInfo(run_time, knit_time)
