"""Lane-layout shootout on the real TPU: chunk axis leading vs trailing.

The analytic roofline (ops/roofline.py) puts the streamed engine 3.6-9.7x
off HBM light-speed on the v5e.  Prime suspect: with the variant chunk as
the LEADING vmap axis, gates on low-significance qubits leave trailing
state dims < 128 that XLA pads onto the lane axis.  ops/lane_engine.py
runs the identical execution plan with the chunk axis TRAILING (always a
full lane vector).  This records the evidence: same fragment, same
device-side slot-table gather, same scan shape, one scalar fetch —
only the layout differs.

Usage: python benchmarks/lane_layout_probe.py [--config hwe 16 5]
       [--chunk 256] [--reps 5] [--q 10]
Appends one JSON object per run to lane_layout_probe.json.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", nargs=3, default=["hwe", "16", "5"])
    ap.add_argument("--q", type=int, default=10)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--fragment", type=int, default=0)
    ap.add_argument("--fuse", type=int, default=3)
    args = ap.parse_args()
    name, n, d = args.config[0], int(args.config[1]), int(args.config[2])

    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.lane_engine import (
        make_lane_sim,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        _slot_tables,
        label_strides,
        make_sim_fn,
        variant_index_table,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    dev = jax.devices()[0]
    print(f"[lane-probe] device: {dev.device_kind}", flush=True)
    t0 = time.time()
    float(jax.jit(lambda x: (x * x).sum())(jnp.ones((128,))))
    print(f"[lane-probe] warmup dispatch {time.time()-t0:.1f}s", flush=True)

    circ = genCirc(name, n, d)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=args.q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    frag = virt.fragments[args.fragment].name
    prog = virt.programs[frag]
    specs = [vg.spec for vg in virt.vgates]

    sim_one, _, positions, flat_count = make_sim_fn(
        virt, frag, build_matrices=False, fuse_qubits=args.fuse
    )
    sim_chunk, _, _ = make_lane_sim(virt, frag, fuse_qubits=args.fuse)

    chunk = int(min(args.chunk, flat_count))
    n_chunks = -(-flat_count // chunk)
    padded = n_chunks * chunk
    print(
        f"[lane-probe] fragment {frag}: {prog.num_sim_qubits} sim qubits, "
        f"{flat_count} variants, chunk={chunk} x {n_chunks}", flush=True,
    )

    strides, n_inst, _ = label_strides(specs, prog.touching)
    vidx = variant_index_table(
        prog.touching, strides, n_inst, padded, clamp_to=flat_count
    )
    col_of = {g: i for i, g in enumerate(prog.touching)}
    gcols = [col_of[slot.vgate_idx] for slot in prog.slots]
    tables = [
        tuple(jnp.asarray(m) for m in t) for t in _slot_tables(prog, specs)
    ]
    valid = (np.arange(padded) < flat_count).astype(np.float32)
    xs = (
        np.ascontiguousarray(vidx.reshape(n_chunks, chunk, -1)),
        np.ascontiguousarray(valid.reshape(n_chunks, chunk)),
    )
    w = jnp.asarray(
        np.random.default_rng(0).random(1 << len(positions)), jnp.float32
    )

    def gather(vc):
        return [
            tuple(t[vc[:, g]] for t in tabs)
            for g, tabs in zip(gcols, tables)
        ]

    def body_lead(carry, x):
        vc, va = x
        rows = jax.vmap(sim_one)(gather(vc))        # [C, 2^k]
        return carry + jnp.sum((rows @ w) * va), None

    def body_lane(carry, x):
        vc, va = x
        rows = sim_chunk(gather(vc))                # [2^k, C]
        return carry + jnp.sum((w @ rows) * va), None

    out = {
        "config": f"{name}_{n}_{d}_p2_q{args.q}",
        "fragment": frag,
        "variants": flat_count,
        "sim_qubits": prog.num_sim_qubits,
        "chunk": chunk,
        "fuse_qubits": args.fuse,
        "device": str(dev.device_kind),
    }

    for tag, body in (("lead", body_lead), ("lane", body_lane)):
        @jax.jit
        def step(xs, body=body):
            c, _ = jax.lax.scan(body, jnp.float32(0.0), xs)
            return c

        t0 = time.perf_counter()
        val = float(step(xs))
        out[f"{tag}_first_s"] = round(time.perf_counter() - t0, 3)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            v2 = float(step(xs))
            ts.append(time.perf_counter() - t0)
        out[f"{tag}_steady_s"] = round(float(np.median(ts)), 4)
        out[f"{tag}_sum"] = val
        print(
            f"[lane-probe] {tag}: first={out[f'{tag}_first_s']}s "
            f"steady={out[f'{tag}_steady_s']}s sum={val:.6f}", flush=True,
        )

    out["lane_speedup"] = round(
        out["lead_steady_s"] / max(1e-9, out["lane_steady_s"]), 3
    )
    assert abs(out["lead_sum"] - out["lane_sum"]) < 1e-2 * max(
        1.0, abs(out["lead_sum"])
    ), (out["lead_sum"], out["lane_sum"])
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "lane_layout_probe.json"
    )
    hist = []
    if path.exists():
        hist = json.loads(path.read_text())
    hist.append(out)
    path.write_text(json.dumps(hist, indent=1))
    print(f"[lane-probe] lane_speedup={out['lane_speedup']}x -> {path}",
          flush=True)


if __name__ == "__main__":
    main()
