"""Blocked-kernel probe past the VMEM boundary: syc-36-class fragment
(n=21 sim qubits) on the real chip (VERDICT r4 action #2).

Interleaved same-process A/B (the only trustworthy instrument on the
tunneled v5e — PERF.md measurement-hygiene policy):

  A: the XLA per-label sim (the streamed scan's flat row producer) over
     L labels of the 21-qubit fragment;
  B: the segmented HBM-resident blocked kernel
     (ops/pallas_blocked.make_blocked_chunk_kernel) on the same labels.

Both legs end in a scalar fetch; rows are checked equal first.  Writes
``blocked_probe.json`` with per-label times, compile walls and the
load proxy.

    python benchmarks/blocked_probe.py [--labels 8] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

_T0 = time.perf_counter()


def _phase(msg):
    print(f"[blocked +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--labels", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--window", type=int, default=18)
    ap.add_argument("--circ", default="syc",
                    help="zoo short name (ghz 40 1 --q 20 gives a "
                         "21-sim-qubit fragment with a 20-op suffix in "
                         "2 segments — the segmentation showcase; syc "
                         "36 1 has a 1-op suffix: capability, not win)")
    ap.add_argument("--n", type=int, default=36)
    ap.add_argument("--depth", type=int, default=1)
    ap.add_argument("--q", type=int, default=20,
                    help="maxNQubitsPerPartition (Q20 gives a 21-sim-"
                         "qubit largest fragment on syc-36 — past the "
                         "n=20 VMEM gate; Q19 lands on n=20, which the "
                         "blocked kernel declines)")
    ap.add_argument("--out", default="blocked_probe.json")
    args = ap.parse_args()

    import logging

    import numpy as np

    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_blocked import (  # noqa: E501
        make_blocked_chunk_kernel,
        plan_segments,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (  # noqa: E501
        _plan_ops,
        _slot_tables,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (  # noqa: E501
        make_sim_fn,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.jaxcache import (  # noqa: E501
        enable_cache,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (  # noqa: E501
        get_logger,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    get_logger().setLevel(logging.WARNING)
    enable_cache()

    t = time.perf_counter()
    float(jnp.zeros((8,)).sum())
    init_s = time.perf_counter() - t
    device = str(jax.devices()[0])
    _phase(f"backend {device} up in {init_s:.1f}s")

    _phase(f"solving {args.circ}-{args.n} d{args.depth} P2 Q{args.q}")
    circ = genCirc(args.circ, args.n, args.depth)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=args.q,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    # widest fragment; among equals, the one with the deepest per-label
    # (suffix) op stream — that is where segmentation has work to do
    name = max(
        (r.name for r in virt.fragments),
        key=lambda nm: (virt.programs[nm].num_sim_qubits,
                        len(_plan_ops(virt, nm)[1])),
    )
    prog = virt.programs[name]
    n = prog.num_sim_qubits
    _, suffix, _ = _plan_ops(virt, name)
    segs = plan_segments(suffix, n, min(args.window, n - 1))
    _phase(f"fragment {name}: n={n} sim qubits, {len(suffix)} ops, "
           f"{len(segs)} segments at w={args.window}")

    L = args.labels
    rng = np.random.default_rng(5)
    lab = jnp.asarray(rng.integers(
        0, [vg.spec.num_instantiations for vg in virt.vgates],
        size=(L, len(virt.vgates)),
    ).astype(np.int32))

    # ---- A: XLA per-label scan (the streamed flat row producer) -------
    sim_one, _, positions, _ = make_sim_fn(
        virt, name, build_matrices=False, fused_slots=True
    )
    specs = [vg.spec for vg in virt.vgates]
    tables = _slot_tables(prog, specs, fused=True)
    tabs_dev = [
        tuple(jnp.asarray(t) for t in tabs) for tabs in tables
    ]
    gids = [slot.vgate_idx for slot in prog.slots]

    def xla_rows_sum(lab_):
        def one(_, row):
            mats = [
                tuple(t[row[g]] for t in tabs)
                for tabs, g in zip(tabs_dev, gids)
            ]
            return None, sim_one(mats).sum()

        _, s = jax.lax.scan(one, None, lab_)
        return s.sum()

    xla_fn = jax.jit(xla_rows_sum)
    _phase("compiling + first-running the XLA leg")
    t = time.perf_counter()
    sa = float(xla_fn(lab))
    xla_first = time.perf_counter() - t
    _phase(f"XLA first {xla_first:.1f}s sum={sa:.6f}")

    # ---- B: blocked kernel -------------------------------------------
    built = make_blocked_chunk_kernel(
        virt, name, L, window=args.window,
        interpret=jax.default_backend() == "cpu",
    )
    assert built is not None, f"blocked kernel declined n={n}"
    rows_fn, pos_b = built
    assert list(pos_b) == list(positions)

    blk_fn = jax.jit(lambda lab_: rows_fn(lab_).sum())
    _phase("compiling + first-running the blocked-kernel leg (Mosaic)")
    t = time.perf_counter()
    sb = float(blk_fn(lab))
    blk_first = time.perf_counter() - t
    _phase(f"blocked first {blk_first:.1f}s sum={sb:.6f}")
    # row totals must agree (full parity is locked by the CPU interpret
    # differentials; here one scalar over 2^21 x L rows)
    assert abs(sa - sb) < 1e-3 * max(1.0, abs(sa)), (sa, sb)

    # ---- interleaved steady reps --------------------------------------
    xla_reps, blk_reps = [], []
    for _ in range(max(3, args.reps)):
        t = time.perf_counter()
        float(xla_fn(lab))
        xla_reps.append(time.perf_counter() - t)
        t = time.perf_counter()
        float(blk_fn(lab))
        blk_reps.append(time.perf_counter() - t)
    xm = sorted(xla_reps)[len(xla_reps) // 2]
    bm = sorted(blk_reps)[len(blk_reps) // 2]
    _phase(f"steady: XLA {xm:.3f}s, blocked {bm:.3f}s "
           f"({xm / bm:.2f}x) for {L} labels")

    report = {
        "device": device,
        "load_proxy_first_dispatch_s": round(init_s, 3),
        "config": (f"{args.circ}-{args.n} d{args.depth} P2 Q{args.q} "
                   "(largest fragment)"),
        "fragment_sim_qubits": n,
        "ops": len(suffix),
        "segments": len(segs),
        "window": args.window,
        "labels": L,
        "xla_first_s": round(xla_first, 2),
        "blocked_first_s": round(blk_first, 2),
        "xla_steady_s": [round(r, 4) for r in xla_reps],
        "blocked_steady_s": [round(r, 4) for r in blk_reps],
        "xla_us_per_label": round(xm / L * 1e6, 1),
        "blocked_us_per_label": round(bm / L * 1e6, 1),
        "speedup": round(xm / bm, 2),
        "row_sum_match": abs(sa - sb),
    }
    pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({
        "metric": "syc36_blocked_kernel_speedup",
        "value": report["speedup"], "unit": "x",
    }))


if __name__ == "__main__":
    main()
