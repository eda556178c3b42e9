"""Interleaved A/B probe: collapse-mode row producers on the sampled
scan (XLA `_collapse_row_builder` vs the VMEM kernel
`_collapse_row_builder_pallas`), same process, alternating reps, scalar
fetches — the only trustworthy comparison on the tunneled backend
(PERF.md measurement-hygiene policy).

Also sweeps the scan BLOCK size: the production `_scan_core` block is
compile-time-bounded (`_label_budget`), not perf-optimal; if per-step
overhead dominates at block 16, larger blocks amortise it for both
sides.

    python benchmarks/collapse_ab_probe.py [--n 16] [--rows 2048]
        [--blocks 16 64] [--out collapse_ab_probe.json]
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
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--blocks", type=int, nargs="+", default=[16, 64])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--keep", type=int, default=4)
    ap.add_argument("--full", type=int, default=0,
                    help="additionally interleave FULL sampled_knit "
                    "estimates (this many QPD samples) xla-vs-pallas "
                    "in the same process")
    ap.add_argument("--out", default="collapse_ab_probe.json")
    args = ap.parse_args()

    import logging

    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (  # noqa: E501
        _collapse_row_builder,
        _collapse_row_builder_pallas,
        sample_label_counts,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (  # noqa: E501
        get_logger,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    get_logger().setLevel(logging.WARNING)
    import jax
    import jax.numpy as jnp

    t = time.perf_counter()
    float(jnp.zeros((8, 8)).sum())
    load_proxy = time.perf_counter() - t

    circ = genCirc("qft", args.n, 1)
    cutter = Cutter(circ, maxNPartitions=2,
                    maxNQubitsPerPartition=args.n - 1, gammaMode=True)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    frag = max(virt.fragments,
               key=lambda r: virt.programs[r.name].num_data_qubits).name
    width = virt.programs[frag].num_data_qubits
    print(f"[probe] frag {frag}: {width} data qubits", file=sys.stderr,
          flush=True)

    uniq, _ = sample_label_counts(virt, 20 * args.rows, 7, method="lhs")
    reps_needed = -(-args.rows // len(uniq)) if len(uniq) else 1
    lab = np.asarray(
        np.concatenate([uniq] * max(1, reps_needed))[: args.rows],
        np.int32,
    )
    rng = np.random.default_rng(13)

    out = {
        "config": f"qft-{args.n} collapse-mode row producers",
        "device": str(jax.devices()[0]),
        "load_proxy_first_dispatch_s": round(load_proxy, 3),
        "rows": int(lab.shape[0]),
        "width_qubits": width,
        "results": [],
    }

    for block in args.blocks:
        nb = lab.shape[0] // block
        L = nb * block
        sides = {}
        fx, posx, ns, _ = _collapse_row_builder(virt, frag)
        bp = _collapse_row_builder_pallas(virt, frag, block)
        assert bp is not None, "kernel declined the fragment"
        fp = bp[0]
        u = rng.random((L, max(1, ns))).astype(np.float32)

        def make(fn):
            def step(xs):
                lab_c, u_c = xs

                def body(acc, x):
                    rows, _pos = fn(x[0], x[1])
                    return acc + rows.sum(), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    (lab_c.reshape(nb, block, -1),
                     u_c.reshape(nb, block, -1)),
                )
                return acc

            return jax.jit(step), (jnp.asarray(lab[:L]), jnp.asarray(u))

        sides["xla"] = make(fx)
        sides["pallas"] = make(fp)

        rec = {"block": block, "scan_steps": nb}
        for name, (fn, xs) in sides.items():
            t = time.perf_counter()
            v0 = float(fn(xs))
            rec[f"{name}_first_s"] = round(time.perf_counter() - t, 2)
            rec[f"{name}_sum"] = v0
        for r in range(args.reps):
            for name, (fn, xs) in sides.items():
                t = time.perf_counter()
                float(fn(xs))
                rec.setdefault(f"{name}_times", []).append(
                    round(time.perf_counter() - t, 4)
                )
        for name in sides:
            ts = sorted(rec[f"{name}_times"])
            rec[f"{name}_steady_s"] = ts[len(ts) // 2]
            rec[f"{name}_us_per_row"] = round(
                1e6 * rec[f"{name}_steady_s"] / L, 2
            )
        rec["speedup"] = round(
            rec["xla_steady_s"] / rec["pallas_steady_s"], 3
        )
        assert abs(rec["xla_sum"] - rec["pallas_sum"]) < 1e-2 * max(
            1.0, abs(rec["xla_sum"])
        ), (rec["xla_sum"], rec["pallas_sum"])
        out["results"].append(rec)
        print(json.dumps(rec), file=sys.stderr, flush=True)

    if args.full:
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (  # noqa: E501
            sampled_knit,
        )

        keep = set(range(args.keep))

        def est(pallas: bool):
            t = time.perf_counter()
            d, se = sampled_knit(
                virt, args.full, seed=17, keep_clbits=keep,
                with_stderr=True, method="lhs", control_variate=True,
                pallas_variant=pallas,
            )
            float(np.asarray(d.values).sum())
            return time.perf_counter() - t

        rec = {"samples": args.full}
        rec["xla_first_s"] = round(est(False), 2)
        rec["pallas_first_s"] = round(est(True), 2)
        for r in range(args.reps):
            rec.setdefault("xla_times", []).append(round(est(False), 3))
            rec.setdefault("pallas_times", []).append(
                round(est(True), 3)
            )
        for name in ("xla", "pallas"):
            ts = sorted(rec[f"{name}_times"])
            rec[f"{name}_steady_s"] = ts[len(ts) // 2]
        rec["speedup"] = round(
            rec["xla_steady_s"] / rec["pallas_steady_s"], 3
        )
        out["full_estimate"] = rec
        print(json.dumps(rec), file=sys.stderr, flush=True)

    pathlib.Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
