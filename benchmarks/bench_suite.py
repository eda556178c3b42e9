"""Benchmark suite: sweep the reference's recorded configs end-to-end.

For every config in the reference's baseline-of-record (BASELINE.md —
`bench_results/c_e_refactor/` wall-clocks), run: generate -> optimal cut
search -> rewrite, and (when the variant fan-out is tractable for this
host) simulate + knit + fidelity vs the uncut oracle.  Emits a Markdown
comparison table plus JSON.

    python benchmarks/bench_suite.py [--out BENCH_TABLE.md] [--max-instances N]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# (tag, circ, n, depth, P, Q, reference total wall seconds [cut-search only])
BASELINE_CONFIGS = [
    ("add_10", "add", 10, 1, 2, 10, 42.1),
    ("aqft_10", "aqft", 10, 1, 2, 10, 240.4),
    ("ghz_24", "ghz", 24, 1, 2, 12, 878.4),
    ("hwe_10", "hwe", 10, 1, 2, 10, 5.9),
    ("qft_10", "qft", 10, 1, 2, 10, 417.4),
    ("sup_20", "sup", 20, 1, 2, 10, 317.6),
    ("sup_25", "sup", 25, 1, 2, 13, 924.1),
    ("syc_12", "syc", 12, 2, 2, 10, 6.3),
]


def run_config(tag, circ_name, n, depth, P, Q, ref_s, max_instances,
               use_streamed=False, reps=0):
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
        simulate_circuit_host,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    import jax
    import jax.numpy as jnp

    row = {"config": tag, "ref_wall_s": ref_s}
    # per-row load proxy (r5 measurement-hygiene policy): the latency of
    # one trivial dispatch names the tunnel-load regime this row was
    # measured under
    t = time.perf_counter()
    float(jnp.zeros((8,)).sum())
    row["load_proxy_s"] = round(time.perf_counter() - t, 3)
    t0 = time.perf_counter()
    circ = genCirc(circ_name, n, depth)
    cutter = Cutter(
        circ, maxNPartitions=P, maxNQubitsPerPartition=Q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    ok = cutter.solve()
    row["solve_s"] = round(time.perf_counter() - t0, 4)
    if not ok:
        row["status"] = "unsat"
        return row
    cut_circ = cutter.getResultCircs()[3]
    S, A, L, nW, nG, _Q, _Qp, C, _Cp = cutter.getModelKeyResults()
    row.update(S=S, A=A, L=L, n_wire_cuts=nW, n_gate_cuts=nG)
    row["cut_wall_s"] = round(time.perf_counter() - t0, 4)
    row["speedup_vs_ref"] = round(ref_s / max(row["cut_wall_s"], 1e-9), 1)

    virt = VirtualCircuit(cut_circ)
    row["instances"] = virt.total_instantiations()
    engine = "auto"
    if row["instances"] > max_instances:
        if not use_streamed:
            row["status"] = f"cut-only (instances > {max_instances})"
            return row
        engine = "streamed"
        row["engine"] = engine

    t1 = time.perf_counter()
    if engine == "streamed":
        # build the scan once so the steady serving step can be measured
        # on the SAME jitted program (median of ``reps`` full-fetch
        # executions after the first compile+run)
        import numpy as np

        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E501
            Distribution,
        )
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (  # noqa: E501
            auto_chunk,
            make_streamed_knit,
        )

        chunk = auto_chunk(virt, 512, 1, noisy=False)
        step, xs, meta = make_streamed_knit(virt, chunk)
        jstep = jax.jit(step)
        vals = np.asarray(jstep(xs))
        row["sim_knit_s"] = round(time.perf_counter() - t1, 4)
        if reps:
            rr = []
            for _ in range(reps):
                tr = time.perf_counter()
                np.asarray(jstep(xs))
                rr.append(time.perf_counter() - tr)
            row["steady_sim_knit_s"] = round(sorted(rr)[len(rr) // 2], 4)
            row["steady_reps_s"] = [round(r, 4) for r in rr]
        knitted = Distribution(vals, meta["positions"], virt.num_clbits)
    else:
        knitted, info = run_virtual_circuit(virt, project=False,
                                            engine=engine)
        row["sim_knit_s"] = round(time.perf_counter() - t1, 4)
    # fidelity check: host oracle for wide circuits (device statevectors
    # beyond ~2^20 amplitudes hit pathological tile padding / HBM limits
    # on the tunneled backend — see CLAUDE.md), device oracle otherwise
    if circ.num_qubits > 20:
        import numpy as np

        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.bench_impl import (
            _oracle_fidelity,
        )

        row["fidelity_vs_uncut"] = _oracle_fidelity(
            circ, np.asarray(knitted.values)
        )
    else:
        row["fidelity_vs_uncut"] = float(
            hellinger_fidelity(simulate_circuit_host(circ), knitted)
        )
    row["e2e_wall_s"] = round(time.perf_counter() - t0, 4)
    row["status"] = "ok"
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    # default output is a scratch file: BENCH_TABLE.md is CURATED (the
    # generated table plus hand-written TPU/serving sections) — a sweep
    # once clobbered it silently.  Pass --out BENCH_TABLE.md explicitly
    # only when regenerating the table section on purpose.
    ap.add_argument("--out", default="bench_table_sweep.md")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--max-instances", type=int, default=20000)
    ap.add_argument("--streamed", action="store_true",
                    help="run over-cap configs with the constant-memory "
                         "streaming engine instead of skipping them")
    ap.add_argument("--all-streamed", action="store_true",
                    help="route EVERY config through the streamed scan "
                         "(one compile-lean program per config — the r5 "
                         "single-regime regeneration shape)")
    ap.add_argument("--reps", type=int, default=0,
                    help="steady sim+knit repeats per config (median "
                         "recorded; r5 policy: 3)")
    ap.add_argument("--only", default=None,
                    help="comma-separated config tags to run")
    args = ap.parse_args()

    only = set(args.only.split(",")) if args.only else None
    rows = []
    for cfg in BASELINE_CONFIGS:
        if only and cfg[0] not in only:
            continue
        print(f"[suite] {cfg[0]} ...", file=sys.stderr, flush=True)
        max_inst = 0 if args.all_streamed else args.max_instances
        rows.append(run_config(
            *cfg, max_inst, args.streamed or args.all_streamed,
            reps=args.reps,
        ))
        print(f"[suite] {cfg[0]}: {rows[-1]}", file=sys.stderr, flush=True)

    cols = [
        "config", "ref_wall_s", "solve_s", "instances",
        "sim_knit_s", "steady_sim_knit_s", "e2e_wall_s",
        "e2e_speedup_vs_ref", "fidelity_vs_uncut", "load_proxy_s",
        "status",
    ]
    for row in rows:
        if "e2e_wall_s" in row:
            row["e2e_speedup_vs_ref"] = round(
                row["ref_wall_s"] / max(row["e2e_wall_s"], 1e-9), 1
            )
    lines = [
        "# Benchmark suite vs reference baseline",
        "",
        "`ref_wall_s` is the reference's recorded end-to-end wall-clock for "
        "the *cut-search-only* pipeline (BASELINE.md); `cut_wall_s` is ours "
        "for the same work; `sim_knit_s` adds full QPD variant simulation + "
        "knit + fidelity (work the reference baseline never did).",
        "",
        "| " + " | ".join(cols) + " |",
        "|" + "---|" * len(cols),
    ]
    for row in rows:
        lines.append(
            "| " + " | ".join(str(row.get(c, "—")) for c in cols) + " |"
        )
    out = pathlib.Path(args.out)
    out.write_text("\n".join(lines) + "\n")
    if args.json_out:
        pathlib.Path(args.json_out).write_text(json.dumps(rows, indent=2))
    print("\n".join(lines))


if __name__ == "__main__":
    main()
