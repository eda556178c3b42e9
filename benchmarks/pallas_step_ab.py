"""Interleaved A/B: the FULL production streamed step (sim + fold +
knit) with the whole-variant-in-VMEM kernel (engine="pallas") vs the
banked+staged XLA path — the number that decides whether the kernel
moves the northstar sup-25 row (VERDICT r3 #3 "done" criterion).

Same process, alternating reps, scalar fetches; the dense-fetch wall is
also measured per side (the northstar "exact steady" includes it).

Usage: python benchmarks/pallas_step_ab.py [--config sup25] [--reps 4]
Writes pallas_step_ab.json.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

CONFIGS = {
    "sup25": ("sup", 25, 1, 13, 252),
    "sup20": ("sup", 20, 1, 10, 504),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sup25")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=0,
                    help="override the config's label-chunk size (0 = "
                         "config default); bigger chunks amortise "
                         "per-kernel-invocation overhead in the scan")
    ap.add_argument("--with-unstaged", action="store_true",
                    help="add a pallas_unstaged arm (r4 kernel without "
                         "the r5 staged checkpoints) — costs one more "
                         "Mosaic deploy compile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (  # noqa: E501
        make_streamed_knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.jaxcache import (  # noqa: E501
        enable_cache,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    enable_cache()
    name, n, depth, q, chunk = CONFIGS[args.config]
    cfg_tag = args.config
    if args.chunk:
        chunk = args.chunk
        cfg_tag = f"{args.config}@c{chunk}"  # keep the default row intact
    circ = genCirc(name, n, depth)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=q,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    out = {"config": cfg_tag, "chunk": chunk,
           "device": jax.devices()[0].device_kind}
    t0 = time.perf_counter()
    float(jnp.zeros((8,)).sum())
    out["load_proxy_first_dispatch_s"] = round(time.perf_counter() - t0, 3)

    arms = [("pallas", dict(pallas_variant=True)),
            ("xla_banked", dict(pallas_variant=False))]
    if args.with_unstaged:
        arms.insert(1, ("pallas_unstaged",
                        dict(pallas_variant=True, pallas_staged=False)))
    builds = {}
    for key, kw in arms:
        step, xs, meta = make_streamed_knit(
            virt, chunk, share_prefix=True, hoist_banks=True, **kw,
        )
        builds[key] = (step, xs, meta)
        print(f"[ab] built {key}", flush=True)

    banks = {}
    for key, (step, xs, meta) in builds.items():
        bf = meta.get("bank_fn")
        if bf is None:  # pallas side: the kernel shares its own prefix
            banks[key] = None
            out[f"{key}_bank_build_s"] = 0.0
            continue
        t0 = time.perf_counter()
        b = jax.jit(bf)()
        for leaf in jax.tree.leaves(b):
            if leaf.size:
                float(leaf.reshape(-1)[0])
        out[f"{key}_bank_build_s"] = round(time.perf_counter() - t0, 2)
        banks[key] = b
        print(f"[ab] {key} bank build {out[f'{key}_bank_build_s']}s",
              flush=True)

    fns = {}
    for key, (step, xs, meta) in builds.items():
        if banks[key] is None:
            f = jax.jit(lambda xs, b, _s=step: jnp.sum(_s(xs)))
        else:
            f = jax.jit(lambda xs, b, _s=step: jnp.sum(_s(xs, b)))
        t0 = time.perf_counter()
        v = float(f(xs, banks[key]))
        out[f"{key}_first_s"] = round(time.perf_counter() - t0, 2)
        out[f"{key}_sum"] = v
        print(f"[ab] {key} first {out[f'{key}_first_s']}s sum={v:.8f}",
              flush=True)
        fns[key] = (f, xs)
    assert abs(out["pallas_sum"] - out["xla_banked_sum"]) < 1e-3
    if "pallas_unstaged_sum" in out:
        assert abs(
            out["pallas_unstaged_sum"] - out["xla_banked_sum"]
        ) < 1e-3

    times = {k: [] for k in fns}
    keys = list(fns)
    for rep in range(args.reps):
        for key in keys if rep % 2 == 0 else reversed(keys):
            f, xs = fns[key]
            t0 = time.perf_counter()
            float(f(xs, banks[key]))
            dt = time.perf_counter() - t0
            times[key].append(dt)
            print(f"[ab] rep{rep} {key} {dt:.3f}s", flush=True)
    for key in times:
        out[f"{key}_steady_s"] = round(float(np.median(times[key])), 3)
        out[f"{key}_times"] = [round(t, 3) for t in times[key]]
    out["speedup"] = round(
        out["xla_banked_steady_s"] / out["pallas_steady_s"], 3
    )

    # dense-fetch wall (the northstar exact leg includes it): run the
    # step and fetch the full knitted vector once per side
    for key, (step, xs, meta) in builds.items():
        if banks[key] is None:
            g = jax.jit(lambda xs, b, _s=step: _s(xs))
        else:
            g = jax.jit(lambda xs, b, _s=step: _s(xs, b))
        t0 = time.perf_counter()
        vals = np.asarray(g(xs, banks[key]))
        out[f"{key}_step_plus_fetch_s"] = round(
            time.perf_counter() - t0, 2
        )
        out["fetch_mb"] = round(vals.nbytes / 1e6, 1)
    print(f"[ab] {json.dumps(out)}", flush=True)
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "pallas_step_ab.json"
    )
    existing = []
    if path.exists():
        existing = json.loads(path.read_text())
    existing = [e for e in existing if e.get("config") != cfg_tag]
    path.write_text(json.dumps(existing + [out], indent=2))
    print(f"[ab] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
