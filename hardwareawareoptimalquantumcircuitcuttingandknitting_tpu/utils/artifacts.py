"""Per-run artifact directory management.

Mirrors the reference's benchmark artifact layout
(benchmarks/benchmark.py:31-37,75-88): a run directory named
``<circ>_<n>_<depth>_<P>_<Q>_<timestamp>`` holding ``run.log``, circuit
renders, instantiations, plus (new here) the serialized cut plan and a
metrics JSON — the checkpoint/resume surface the reference lacks (SURVEY §5).
"""
from __future__ import annotations

import datetime
import json
import pathlib

from ..circuit.circuit import Circuit


def make_run_dir(base: str, tag: str) -> pathlib.Path:
    stamp = datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    path = pathlib.Path(base) / f"{tag}_{stamp}"
    n = 1
    while path.exists():  # same-second runs get a numeric suffix
        path = pathlib.Path(base) / f"{tag}_{stamp}-{n}"
        n += 1
    (path / "instantiations").mkdir(parents=True, exist_ok=True)
    return path


def save_circuit(circ: Circuit, directory, name: str) -> None:
    p = pathlib.Path(directory) / f"{name}.txt"
    with open(p, "w") as f:
        f.write(circ.draw())
        f.write("\n")


def save_metrics(directory, metrics: dict) -> None:
    with open(pathlib.Path(directory) / "metrics.json", "w") as f:
        json.dump(metrics, f, indent=2, default=str)
