"""Same-day A/B probe: bf16 quantized serving vs the f32 streamed step.

Interleaved in one process with scalar fetches (tunnel compile/fetch
variance, verify SKILL.md).  Each arm builds its own hoisted banks (the
bank dtype follows the state dtype).  ``tv_vs_f32`` records the
total-variation distance of the bf16 knitted distribution from f32,
computed ON DEVICE (one scalar fetch) — the accuracy price of halving
state HBM bytes.

Usage: python benchmarks/bf16_ab_probe.py [--config sup25] [--reps 4]
Writes bf16_ab_probe.json.
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
    # name: (zoo name, n, depth, Q, chunk)
    "sup25": ("sup", 25, 1, 13, 256),
    "sup20": ("sup", 20, 1, 10, 512),
    "hwe16": ("hwe", 16, 5, 10, 512),
    "aqft16": ("aqft", 16, 1, 10, 128),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sup25")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--shots", type=int, default=20000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sampling import (
        sample_indices_device,
        smolin_project_traced,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    name, n, depth, q, chunk = CONFIGS[args.config]
    circ = genCirc(name, n, depth)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    out = {
        "config": args.config, "chunk": chunk,
        "device": jax.devices()[0].device_kind, "shots": args.shots,
    }
    # PIN the bank budget across arms: default_bank_budget scales with
    # dtype, which would conflate the dtype comparison with a deeper
    # bank (the deep-bank gain is measured separately, BENCH_TABLE_TPU)
    bank_budget = 512 << 20
    out["bank_mb"] = bank_budget >> 20
    arms = {}
    for key, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        step, xs, meta = make_streamed_knit(
            virt, chunk, share_prefix=True, hoist_banks=True, dtype=dt,
            bank_budget_bytes=bank_budget,
        )
        t0 = time.perf_counter()
        banks = None
        if meta["bank_fn"] is not None:
            banks = jax.jit(meta["bank_fn"])()
            for leaf in jax.tree.leaves(banks):
                if leaf.size:
                    float(leaf.reshape(-1)[0])
        out[f"{key}_bank_build_s"] = round(time.perf_counter() - t0, 2)

        f = jax.jit(lambda xs, banks, _s=step: jnp.sum(_s(xs, banks)))

        def serve(xs, banks, _s=step):
            proj = smolin_project_traced(_s(xs, banks))
            return sample_indices_device(
                proj, args.shots, jax.random.PRNGKey(0)
            )

        sv = jax.jit(serve)
        t0 = time.perf_counter()
        out[f"{key}_sum"] = float(f(xs, banks))
        out[f"{key}_first_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        np.asarray(sv(xs, banks))
        out[f"{key}_shots_first_s"] = round(time.perf_counter() - t0, 2)
        arms[key] = (f, sv, xs, banks, step)
        print(f"[ab] {key} built: bank {out[f'{key}_bank_build_s']}s "
              f"first {out[f'{key}_first_s']}s "
              f"shots_first {out[f'{key}_shots_first_s']}s "
              f"sum {out[f'{key}_sum']}", flush=True)

    # accuracy price, on device: TV(f32, bf16) as one scalar fetch
    s32, sb16 = arms["f32"][4], arms["bf16"][4]

    def tvfn(xs, b32, b16):
        return 0.5 * jnp.sum(jnp.abs(s32(xs, b32) - sb16(xs, b16)))

    out["tv_vs_f32"] = float(jax.jit(tvfn)(
        arms["f32"][2], arms["f32"][3], arms["bf16"][3]
    ))
    print(f"[ab] total-variation bf16 vs f32: {out['tv_vs_f32']:.3e}",
          flush=True)

    times = {k: {"step": [], "shots": []} for k in arms}
    for rep in range(args.reps):
        order = ("f32", "bf16") if rep % 2 == 0 else ("bf16", "f32")
        for key in order:
            f, sv, xs, banks = arms[key][:4]
            t0 = time.perf_counter()
            float(f(xs, banks))
            times[key]["step"].append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(sv(xs, banks))
            times[key]["shots"].append(time.perf_counter() - t0)
            print(f"[ab] rep{rep} {key} step {times[key]['step'][-1]:.3f}s"
                  f" shots {times[key]['shots'][-1]:.3f}s", flush=True)
    for key in arms:
        for leg in ("step", "shots"):
            out[f"{key}_{leg}_steady_s"] = round(
                float(np.median(times[key][leg])), 3
            )
    out["step_speedup"] = round(
        out["f32_step_steady_s"] / out["bf16_step_steady_s"], 3
    )
    out["shots_speedup"] = round(
        out["f32_shots_steady_s"] / out["bf16_shots_steady_s"], 3
    )
    print(f"[ab] {out}", flush=True)
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "bf16_ab_probe.json"
    )
    existing = []
    if path.exists():
        existing = json.loads(path.read_text())
    existing = [e for e in existing if e.get("config") != args.config]
    path.write_text(json.dumps(existing + [out], indent=2))
    print(f"[ab] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
