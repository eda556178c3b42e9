"""Wide-circuit demo: sycamore-32 cut + streamed marginal knit.

BASELINE.json config #4 ("Sycamore-style random circuit 32-qubit,
sharded subcircuit statevectors").  A 32-clbit distribution is 2^32
floats (16 GB) — it cannot materialise on any single device, and the
reference cannot run this at all (its knit builds the full dict).  Here:

  optimal cut (2 x 16-qubit fragments, 4 gate cuts, 1296 global labels)
  -> streamed marginal knit onto a kept clbit subset (ops/streamed.py,
     keep_clbits) -> validated against the exact lightcone oracle
     (circuit/lightcone.py).

    python benchmarks/syc32_demo.py [--depth 3] [--keep 0 1 2 3] [--chunk 16]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--keep", type=int, nargs="+", default=[0, 1, 2, 3])
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--max-qubits", type=int, default=17)
    ap.add_argument("--pallas", action="store_true",
                    help="whole-variant-in-VMEM kernel rows "
                    "(ops/pallas_variant.py)")
    args = ap.parse_args()

    import logging

    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
        lightcone_circuit, lightcone_marginal,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        Distribution,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (
        get_logger,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    get_logger().setLevel(logging.WARNING)
    import jax
    import jax.numpy as jnp

    # load proxy (measurement-hygiene policy, PERF.md): first trivial
    # dispatch latency names the tunnel-load regime of this row
    t = time.perf_counter()
    float(jnp.zeros((8, 8)).sum())
    load_proxy_s = time.perf_counter() - t

    keep = set(args.keep)
    t0 = time.perf_counter()
    circ = genCirc("syc", args.n, args.depth)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=args.max_qubits,
        maxNQpdCuts=6, maxNCuts=6, maxCutsPerPartitions=6,
    )
    assert cutter.solve(), "unsat"
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    solve_s = time.perf_counter() - t0
    print(f"[syc{args.n}] cut in {solve_s:.2f}s; "
          f"{virt.total_instantiations()} instances, fragments "
          f"{[p.num_sim_qubits for p in virt.programs.values()]} sim qubits",
          file=sys.stderr, flush=True)

    step, xs, meta = make_streamed_knit(virt, chunk=args.chunk,
                                        keep_clbits=keep,
                                        pallas_variant=args.pallas)
    jitted = jax.jit(step)
    t = time.perf_counter()
    vals = jitted(xs)
    host = np.asarray(vals)  # tiny: 2^len(keep)
    first_s = time.perf_counter() - t
    reps = []
    for _ in range(3):
        t = time.perf_counter()
        host = np.asarray(jitted(xs))
        reps.append(time.perf_counter() - t)
    steady_s = sorted(reps)[len(reps) // 2]

    marg = Distribution(host, meta["positions"], virt.num_clbits)
    pre = lightcone_circuit(circ, keep)
    sub = pre[0]
    oracle = lightcone_marginal(circ, keep, precomputed=pre)
    fid = hellinger_fidelity(oracle, marg)
    err = float(np.max(np.abs(
        np.asarray(marg.values, np.float64)
        - np.asarray(oracle.values, np.float64)
    )))

    print(json.dumps({
        "metric": f"syc{args.n}_d{args.depth}_marginal_knit",
        "engine": "pallas" if args.pallas else "streamed",
        "keep_clbits": sorted(keep),
        "global_labels": meta["global_labels"],
        "solve_s": round(solve_s, 3),
        "first_call_s": round(first_s, 2),
        "steady_s": round(steady_s, 3),
        "steady_reps_s": [round(r, 3) for r in reps],
        "load_proxy_first_dispatch_s": round(load_proxy_s, 3),
        "marginal_total": float(host.sum()),
        "fidelity_vs_lightcone": fid,
        "max_abs_err": err,
        "lightcone_qubits": sub.num_qubits,
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
