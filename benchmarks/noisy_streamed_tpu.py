"""Noisy streamed serving at scale on the real TPU.

Reproducible source of ``noisy_streamed_tpu.json``: shot-sampled
trajectory-noise runs through the streamed engine (the reference's
production mode — every run shot-sampled on a noisy backend,
qvm/run.py:24-42 — at fan-outs its dict knit cannot hold).

Usage: python benchmarks/noisy_streamed_tpu.py [--configs sup12,sup20]
       [--trajectories 8] [--shots 1000]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E402
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

CONFIGS = {
    "sup12": ("sup", 12, 1, 10),
    "sup20": ("sup", 20, 1, 10),
    "aqft10": ("aqft", 10, 1, 10),
}


def run_one(key: str, trajectories: int, shots: int) -> dict:
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
        fake_kolkata_v2,
        run_noisy_virtual_circuit,
    )

    name, n, depth, q = CONFIGS[key]
    circ = genCirc(name, n, depth)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=q,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    labels = 1
    for vg in virt.vgates:
        labels *= vg.spec.num_instantiations
    nm = fake_kolkata_v2()
    nm.trajectories = trajectories
    t0 = time.perf_counter()
    dist, _ = run_noisy_virtual_circuit(
        virt, nm, shots=shots, engine="streamed", seed=7,
    )
    wall = time.perf_counter() - t0
    vals = np.asarray(dist.values)
    return {
        "config": f"{name}_{n}_{depth}_2_{q}",
        "labels": labels,
        "trajectories": trajectories,
        "shots": shots,
        "wall_s_incl_compile": round(wall, 1),
        "total_mass": round(float(vals.sum()), 6),
        "support": int((vals > 0).sum()),
        "device": jax.devices()[0].device_kind,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="sup12,sup20")
    ap.add_argument("--trajectories", type=int, default=8)
    ap.add_argument("--shots", type=int, default=1000)
    args = ap.parse_args()
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "noisy_streamed_tpu.json"
    )
    for key in args.configs.split(","):
        print(f"[noisy] {key} x {args.trajectories} trajectories ...",
              flush=True)
        row = run_one(key.strip(), args.trajectories, args.shots)
        print(f"[noisy] {row}", flush=True)
        # persist after EVERY config (crash in config N must not lose 1..N-1)
        doc = json.loads(path.read_text()) if path.exists() else {
            "what": "streamed noisy serving at scale (this script)",
            "runs": [],
        }
        doc["runs"] = [
            r for r in doc.get("runs", [])
            if not (r["config"] == row["config"]
                    and r["trajectories"] == row["trajectories"])
        ] + [row]
        path.write_text(json.dumps(doc, indent=2))


if __name__ == "__main__":
    main()
