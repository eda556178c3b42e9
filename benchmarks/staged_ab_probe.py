"""Same-day A/B probe: staged in-chunk suffix dedup vs the per-label path.

The tunneled TPU's server-side compile and fetch costs vary wildly with
load (verify SKILL.md), so staged-vs-unstaged must be compared
INTERLEAVED in one process with scalar fetches.  Both programs share one
bank build (bank values depend only on the SplitPlan, not the chunk).

Usage: python benchmarks/staged_ab_probe.py [--config sup25] [--reps 4]
Writes staged_ab_probe.json.
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
    # name: (zoo name, n, depth, Q, aligned chunk, unaligned chunk)
    "sup25": ("sup", 25, 1, 13, 252, 256),
    "sup20": ("sup", 20, 1, 10, 504, 512),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sup25")
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    name, n, depth, q, c_al, c_un = CONFIGS[args.config]
    circ = genCirc(name, n, depth)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    out = {"config": args.config, "device": jax.devices()[0].device_kind}
    builds = {}
    for key, chunk in (("staged", c_al), ("flat", c_un)):
        step, xs, meta = make_streamed_knit(
            virt, chunk, share_prefix=True, hoist_banks=True,
        )
        ladders = [
            None if s is None else [t.r_out for t in s]
            for s in meta["stages"]
        ]
        print(f"[ab] {key}: chunk={chunk} ladders={ladders}", flush=True)
        out[f"{key}_chunk"] = chunk
        out[f"{key}_ladders"] = ladders
        builds[key] = (step, xs, meta)
    assert any(
        any(r > 1 for r in lad)
        for lad in out["staged_ladders"] if lad
    ), "staged build did not engage a >1 ladder"
    assert all(
        all(r == 1 for r in lad)
        for lad in out["flat_ladders"] if lad
    ), "flat build unexpectedly engaged staging"

    # one bank build serves both programs (values depend on sp only)
    t0 = time.perf_counter()
    banks = jax.jit(builds["staged"][2]["bank_fn"])()
    for leaf in jax.tree.leaves(banks):
        if leaf.size:
            float(leaf.reshape(-1)[0])
    out["bank_build_s"] = round(time.perf_counter() - t0, 2)
    print(f"[ab] bank build {out['bank_build_s']}s", flush=True)

    fns = {}
    for key, (step, xs, _meta) in builds.items():
        f = jax.jit(lambda xs, banks, _s=step: jnp.sum(_s(xs, banks)))
        t0 = time.perf_counter()
        v = float(f(xs, banks))  # scalar fetch = completion barrier
        out[f"{key}_first_s"] = round(time.perf_counter() - t0, 2)
        out[f"{key}_sum"] = v
        print(f"[ab] {key} first {out[f'{key}_first_s']}s sum={v}",
              flush=True)
        fns[key] = (f, xs)
    assert abs(out["staged_sum"] - out["flat_sum"]) < 1e-3

    times = {"staged": [], "flat": []}
    for rep in range(args.reps):
        for key in ("staged", "flat") if rep % 2 == 0 else ("flat", "staged"):
            f, xs = fns[key]
            t0 = time.perf_counter()
            float(f(xs, banks))
            dt = time.perf_counter() - t0
            times[key].append(dt)
            print(f"[ab] rep{rep} {key} {dt:.3f}s", flush=True)
    for key in times:
        out[f"{key}_steady_s"] = round(float(np.median(times[key])), 3)
        out[f"{key}_times"] = [round(t, 3) for t in times[key]]
    out["speedup"] = round(
        out["flat_steady_s"] / out["staged_steady_s"], 3
    )
    print(f"[ab] {out}", flush=True)
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "staged_ab_probe.json"
    )
    existing = []
    if path.exists():
        existing = json.loads(path.read_text())
    existing = [e for e in existing if e.get("config") != args.config]
    path.write_text(json.dumps(existing + [out], indent=2))
    print(f"[ab] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
