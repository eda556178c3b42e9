"""Pallas-vs-XLA steady-state shootout on the real TPU (r2 VERDICT #5).

The Pallas kernel's design predicts wins on deep, narrow fragments (one
HBM roundtrip for the whole gate chain vs the unrolled XLA path's
per-gate state materialisation).  This records the evidence either way on
hwe-16 d5 (the deep-narrow north-star config: 5 gate cuts, 7776 variants,
13-sim-qubit fragments).

Timing per the measured axon rules (.claude/skills/verify/SKILL.md):
block_until_ready returns early through the tunnel, so every timed run
fetches a scalar; the first call is compile+exec, steady state is the
median of the following fetches.

Usage: python benchmarks/pallas_vs_xla.py [--reps 3] [--config hwe 16 5]
Writes pallas_vs_xla.json at the repo root.
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pallas-timeout", type=int, default=900,
                    help="bound the Mosaic compile+first-run (tunnel "
                         "compiles are unbounded-variance); on expiry the "
                         "timeout itself is recorded as evidence")
    ap.add_argument("--config", nargs=3, default=["hwe", "16", "5"])
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
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_sv import (
        build_fragment_kernel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
        make_sim_fn,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    dev = jax.devices()[0]
    print(f"[shootout] device: {dev.device_kind}", flush=True)
    # absorb the tunnel's first-dispatch latency with a tiny program
    t0 = time.time()
    float(jax.jit(lambda x: (x * x).sum())(jnp.ones((128,))))
    print(f"[shootout] warmup dispatch {time.time()-t0:.1f}s", flush=True)

    circ = genCirc(name, n, d)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=10,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    frag = virt.fragments[0].name
    prog = virt.programs[frag]
    print(
        f"[shootout] fragment {frag}: {prog.num_data_qubits} data / "
        f"{prog.num_sim_qubits} sim qubits, "
        f"{virt.num_instantiations(frag)} variants", flush=True,
    )

    out = {
        "config": f"{name}_{n}_{d}_p2_q10",
        "fragment": frag,
        "variants": virt.num_instantiations(frag),
        "sim_qubits": prog.num_sim_qubits,
        "device": str(dev.device_kind),
    }

    # ---- XLA engine: chunked vmapped scalar-sum --------------------------
    sim_one, all_mats, _pos, flat_count = make_sim_fn(virt, frag)
    # keep the per-program buffer <= 2^20 floats: tunneled server-side
    # compile time scales with the largest buffer (verify SKILL.md)
    chunk = max(1, min(512, flat_count, (1 << 19) // (1 << prog.num_sim_qubits)))
    n_chunks = -(-flat_count // chunk)
    padded = n_chunks * chunk
    if padded != flat_count:
        all_mats = [
            tuple(
                np.concatenate([m, np.repeat(m[-1:], padded - flat_count, 0)])
                for m in mats
            )
            for mats in all_mats
        ]
    batches = [
        (
            [tuple(np.asarray(m[i * chunk:(i + 1) * chunk]) for m in mats)
             for mats in all_mats],
            np.minimum(
                np.maximum(flat_count - i * chunk, 0), chunk
            ).astype(np.int32),
        )
        for i in range(n_chunks)
    ]
    # mask the padding rows so the cross-engine sum check matches the
    # pallas kernel's exact flat_count rows
    xla_step = jax.jit(lambda b, v: jnp.sum(jnp.where(
        jnp.arange(chunk)[:, None] < v, jax.vmap(sim_one)(b), 0.0
    )))

    def xla_all():
        return sum(float(xla_step(b, v)) for b, v in batches)

    t0 = time.perf_counter()
    first_val = xla_all()
    out["xla_first_s"] = round(time.perf_counter() - t0, 3)
    xla_times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        val = xla_all()
        xla_times.append(time.perf_counter() - t0)
    out["xla_steady_s"] = round(float(np.median(xla_times)), 4)
    out["xla_sum"] = first_val
    print(f"[shootout] xla: first={out['xla_first_s']}s "
          f"steady={out['xla_steady_s']}s sum={first_val:.4f}", flush=True)

    # ---- XLA scan variant: whole fan-out on device, ONE host fetch -------
    # (the per-chunk loop above pays a tunnel round-trip per chunk; this is
    # the serving-shaped number, same structure as ops/streamed.py)
    from jax import lax

    xs_stacked = [
        tuple(np.asarray(m).reshape((n_chunks, chunk) + m.shape[1:])
              for m in mats)
        for mats in all_mats
    ]

    valid_per_chunk = np.stack([
        np.minimum(np.maximum(flat_count - i * chunk, 0), chunk)
        for i in range(n_chunks)
    ]).astype(np.int32)

    def scan_body(acc, x):
        chunk_mats, v = x
        rows = jax.vmap(sim_one)(chunk_mats)
        rows = jnp.where(jnp.arange(chunk)[:, None] < v, rows, 0.0)
        return acc + jnp.sum(rows), None

    @jax.jit
    def xla_scan(xs):
        total, _ = lax.scan(
            scan_body, jnp.float32(0.0), (xs, valid_per_chunk)
        )
        return total

    t0 = time.perf_counter()
    sv = float(xla_scan(xs_stacked))
    out["xla_scan_first_s"] = round(time.perf_counter() - t0, 3)
    scan_times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        sv = float(xla_scan(xs_stacked))
        scan_times.append(time.perf_counter() - t0)
    out["xla_scan_steady_s"] = round(float(np.median(scan_times)), 4)
    out["xla_scan_sum"] = sv
    print(f"[shootout] xla_scan: first={out['xla_scan_first_s']}s "
          f"steady={out['xla_scan_steady_s']}s sum={sv:.4f}", flush=True)

    path = pathlib.Path(__file__).resolve().parent.parent / (
        "pallas_vs_xla.json"
    )
    path.write_text(json.dumps(out, indent=2))  # XLA legs recorded first

    # ---- Pallas engine ---------------------------------------------------
    import signal

    def _alarm(signum, frame):
        raise TimeoutError(
            f"Mosaic remote compile exceeded {args.pallas_timeout}s"
        )

    signal.signal(signal.SIGALRM, _alarm)
    built = build_fragment_kernel(virt, frag)
    if built is None:
        out["pallas"] = "unsupported fragment"
    else:
        fn, params, meta = built
        params = jnp.asarray(params)
        pfn = jax.jit(lambda p: jnp.sum(fn(p)))
        try:
            t0 = time.perf_counter()
            signal.alarm(args.pallas_timeout)
            pv = float(pfn(params))
            signal.alarm(0)
            out["pallas_first_s"] = round(time.perf_counter() - t0, 3)
            p_times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                pv = float(pfn(params))
                p_times.append(time.perf_counter() - t0)
            out["pallas_steady_s"] = round(float(np.median(p_times)), 4)
            out["pallas_sum"] = pv
            best_xla = min(
                out["xla_steady_s"],
                out.get("xla_scan_steady_s", out["xla_steady_s"]),
            )
            out["pallas_speedup_vs_xla"] = round(
                best_xla / out["pallas_steady_s"], 2
            )
            print(
                f"[shootout] pallas: first={out['pallas_first_s']}s "
                f"steady={out['pallas_steady_s']}s sum={pv:.4f} "
                f"speedup={out['pallas_speedup_vs_xla']}x", flush=True,
            )
        except BaseException as e:  # record the failure as evidence
            signal.alarm(0)
            out["pallas_error"] = f"{type(e).__name__}: {e}"[:500]
            out["pallas_error_after_s"] = round(time.perf_counter() - t0, 1)
            print(f"[shootout] pallas FAILED: {out['pallas_error']}",
                  flush=True)

    path.write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
