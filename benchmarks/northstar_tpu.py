"""North-star configs end-to-end on the real TPU (BASELINE.json #2/#3).

Runs aqft-16 (mixed wire+gate cuts) and hwe-16 d5 (multi-gate-cut) through
the streamed engine at FULL scale — every global QPD label — and records
wall-clock + steady-state step + fidelity vs the uncut oracle in
``northstar_tpu.json``.

Tunnel measurement rules (.claude/skills/verify/SKILL.md): time by
fetching the result (block_until_ready returns early on axon); keep the
largest program buffer ~2^23 floats so the server-side compile stays in
the minutes range (chunk x 2^n_sv x 2).

Usage: python benchmarks/northstar_tpu.py [--configs aqft16,hwe16] [--reps 3]
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
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E402
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    Distribution,
    simulate_circuit_host,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

CONFIGS = {
    # name: (zoo name, n, depth, Q, chunk)  — chunk keeps the scan-body
    # buffer (chunk x 2 x 2^max_frag_qubits floats) near 2^23
    "aqft16": ("aqft", 16, 1, 10, 128),
    "hwe16": ("hwe", 16, 5, 10, 512),
    "qft16": ("qft", 16, 1, 14, 128),
    "sup20": ("sup", 20, 1, 10, 512),
    "sup25": ("sup", 25, 1, 13, 512),
    "aqft10": ("aqft", 10, 1, 10, 512),
    "ghz24": ("ghz", 24, 1, 12, 512),
}


def run_config(key: str, reps: int, shots: int | None = None,
               share: bool = True, bank_mb: int | None = None,
               dtype: str = "f32", pallas: bool = False) -> dict:
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        auto_chunk,
        make_streamed_knit,
    )

    import jax.numpy as jnp

    name, n, depth, q, chunk = CONFIGS[key]
    out = {"config": key, "device": jax.devices()[0].device_kind}
    # load proxy (measurement-hygiene policy, PERF.md): the first
    # trivial-dispatch latency annotates which tunnel-load regime this
    # row was measured under — rows are only comparable within a regime
    t0 = time.perf_counter()
    float(jnp.zeros((8,)).sum())
    out["load_proxy_first_dispatch_s"] = round(
        time.perf_counter() - t0, 3
    )
    t_all = time.perf_counter()
    circ = genCirc(name, n, depth)
    t0 = time.perf_counter()
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    if not cutter.solve():
        out["status"] = "unsat"
        return out
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    out["solve_s"] = round(time.perf_counter() - t0, 3)
    virt = VirtualCircuit(cut_circ)
    labels = 1
    for vg in virt.vgates:
        labels *= vg.spec.num_instantiations
    out["global_labels"] = labels
    out["frag_qubits"] = [
        p.num_sim_qubits for p in virt.programs.values()
    ]
    out["chunk"] = auto_chunk(virt, chunk)

    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        default_bank_budget,
    )

    _dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype]
    if bank_mb is None:
        bank_mb = default_bank_budget(_dt) >> 20
    out["share_prefix"] = bool(share)
    out["bank_mb_budget"] = bank_mb
    out["dtype"] = dtype
    out["engine"] = "pallas" if pallas else "streamed"
    step_fn, xs, meta = make_streamed_knit(
        virt, out["chunk"], share_prefix=share,
        bank_budget_bytes=bank_mb << 20, hoist_banks=share, dtype=_dt,
        pallas_variant=pallas,
    )
    # staging is NOT forced by shrinking the chunk — measured neutral on
    # the v5e (staged_ab_probe.json); ladders record what engaged anyway
    out["stage_ladders"] = [
        None if st is None else [t.r_out for t in st]
        for st in meta["stages"]
    ]
    if share:
        out["splits"] = [
            None if s is None else {
                "shared": s.shared, "n_anc": s.n_anc,
                "m_split": s.m_split,
                "bank_mb": round(s.bank_bytes / 1e6, 1),
                "est_speedup": round(s.est_flat_bytes / s.est_bytes, 2),
            } for s in meta["splits"]
        ]
    # serving shape: ancestor banks are computed ONCE at deploy and
    # reused by every step (they are pure functions of the plan)
    banks = None
    if meta.get("bank_fn") is not None:
        t0 = time.perf_counter()
        banks = jax.jit(meta["bank_fn"])()
        banks = jax.tree.map(lambda a: a.block_until_ready(), banks)
        # barrier per the axon rules: fetch one scalar per bank leaf
        for leaf in jax.tree.leaves(banks):
            if leaf.size:
                float(leaf.reshape(-1)[0])
        out["bank_build_s"] = round(time.perf_counter() - t0, 2)
    step = jax.jit(step_fn)
    t0 = time.perf_counter()
    values = np.asarray(step(xs, banks))  # fetch = completion barrier
    out["first_call_s"] = round(time.perf_counter() - t0, 2)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        values = np.asarray(step(xs, banks))
        times.append(time.perf_counter() - t0)
    out["steady_step_s"] = round(float(np.median(times)), 3)

    knitted = Distribution(values, meta["positions"], virt.num_clbits)
    # host-side numpy oracle: a 2^25-buffer program must never be
    # compiled through the tunneled backend (sup-25 killed a run here)
    ideal = simulate_circuit_host(circ)
    out["fidelity_vs_uncut"] = float(hellinger_fidelity(ideal, knitted))

    if shots:
        # shot-serving leg: project + sample ON DEVICE, fetch [shots]
        # int32 (the dense fetch above costs ~minutes for sup-25's 2^25
        # vector through the tunnel; this is the serving shape)
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sampling import (
            sample_indices_device,
            smolin_project_traced,
        )

        def serve(xs, banks):
            proj = smolin_project_traced(step_fn(xs, banks))
            return sample_indices_device(
                proj, shots, jax.random.PRNGKey(0)
            )

        sjit = jax.jit(serve)
        t0 = time.perf_counter()
        idx = np.asarray(sjit(xs, banks))
        out["shots_first_s"] = round(time.perf_counter() - t0, 2)
        stimes = []
        for _ in range(reps):
            t0 = time.perf_counter()
            idx = np.asarray(sjit(xs, banks))
            stimes.append(time.perf_counter() - t0)
        out["shots_steady_s"] = round(float(np.median(stimes)), 3)
        out["shots"] = shots
        width = 1 << len(meta["positions"])
        counts = np.bincount(idx, minlength=width) / float(shots)
        sampled = Distribution(
            counts.astype(np.float32), meta["positions"], virt.num_clbits
        )
        out["shots_fidelity"] = float(hellinger_fidelity(ideal, sampled))

    out["e2e_wall_s"] = round(time.perf_counter() - t_all, 2)
    out["status"] = "ok"
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="aqft16,hwe16")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--pallas", action="store_true",
                    help="whole-variant-in-VMEM kernel rows "
                    "(ops/pallas_variant.py; Mosaic deploy compile)")
    ap.add_argument("--shots", type=int, default=None,
                    help="additionally time the on-device project+sample "
                         "serving leg at this shot count")
    ap.add_argument("--share", choices=["on", "off"], default="on",
                    help="tree-share plan prefixes across labels "
                         "(ancestor banks; default on)")
    ap.add_argument("--bank-mb", type=int, default=None,
                    help="ancestor-bank budget per fragment (MB); default "
                         "scales with --dtype (512 f32 / 1024 bf16)")
    ap.add_argument("--dtype", choices=["f32", "bf16"], default="f32",
                    help="state dtype: bf16 = quantized serving mode")
    args = ap.parse_args()

    path = pathlib.Path(__file__).resolve().parent.parent / (
        "northstar_tpu.json"
    )
    for key in args.configs.split(","):
        print(f"[northstar] {key} ...", flush=True)
        row = run_config(
            key.strip(), args.reps, args.shots, share=args.share == "on",
            bank_mb=args.bank_mb, dtype=args.dtype, pallas=args.pallas,
        )
        print(f"[northstar] {row}", flush=True)
        # persist after EVERY config — a crash in config N must not lose
        # the measurements of configs 1..N-1.  Replacement is keyed by
        # (config, bank budget, dtype); annotated probe rows are kept.
        def _key(r):
            return (
                r["config"], r.get("bank_mb_budget"), r.get("dtype", "f32"),
                r.get("engine", "streamed"),
            )

        existing = []
        if path.exists():
            existing = [
                r for r in json.loads(path.read_text())
                if _key(r) != _key(row) or "note" in r
            ]
        path.write_text(json.dumps(existing + [row], indent=2))
    print(f"[northstar] wrote {path}")


if __name__ == "__main__":
    main()
