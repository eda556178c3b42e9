"""Interleaved A/B: whole-variant-in-VMEM Pallas kernel vs the XLA scan.

Attempt #2 at the bandwidth gap (VERDICT r3 #3; attempt #1 recorded in
pallas_vs_xla*.json).  Same-process, alternating reps, scalar fetches
(the only trustworthy comparison on the tunneled backend — verify
SKILL.md).  The probe runs a SLICE of the fragment's variant fan-out
(--probe-variants) so the kernel's full-width row output stays inside
HBM on sup-25-class fragments; per-variant steady time is the metric.

Usage: python benchmarks/pallas_variant_probe.py [--config sup20]
           [--probe-variants 2048] [--reps 4]
Writes pallas_variant_probe.json.
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
    # name: (zoo name, n, depth, Q)
    "sup25": ("sup", 25, 1, 13),
    "sup20": ("sup", 20, 1, 10),
    "hwe16": ("hwe", 16, 5, 10),
    "syc32": ("syc", 32, 3, 17),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="sup20")
    ap.add_argument("--probe-variants", type=int, default=2048)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (Mosaic is TPU-only)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (  # noqa: E501
        make_pallas_variant_fn,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (  # noqa: E501
        _slot_tables,
        make_sim_fn,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.jaxcache import (  # noqa: E501
        enable_cache,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    enable_cache()
    name, n, depth, q = CONFIGS[args.config]
    circ = genCirc(name, n, depth)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=q,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    frag = max(virt.fragments,
               key=lambda r: virt.programs[r.name].num_sim_qubits)
    prog = virt.programs[frag.name]
    print(f"[pv] fragment {frag.name}: {prog.num_sim_qubits} sim qubits",
          flush=True)

    built = make_pallas_variant_fn(virt, frag.name, interpret=args.interpret)
    assert built is not None, "fragment outside kernel width gate"
    kfn, slot_entries, meta = built
    chunk0 = max(1, (1 << 19) >> prog.num_sim_qubits)
    V = min(args.probe_variants, meta["flat_count"])
    V = max(chunk0, (V // chunk0) * chunk0)
    V = min(V, (meta["flat_count"] // chunk0) * chunk0 or chunk0)

    out = {
        "config": args.config, "fragment": frag.name,
        "sim_qubits": prog.num_sim_qubits,
        "flat_count": meta["flat_count"], "probe_variants": V,
        "device": jax.devices()[0].device_kind,
    }

    out["full_rows_gb"] = round(
        meta["flat_count"] * (1 << meta["n"]) * 4 / 1e9, 2
    )
    out["probe_variants"] = V
    # rebuild the kernel gridded over exactly the first V variants (the
    # builder grids over variant_index_table's row count)
    import hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant as _pv  # noqa: E501

    orig = _pv.variant_index_table

    def _sliced(*a, **k):
        return orig(*a, **k)[:V]

    _pv.variant_index_table = _sliced
    try:
        kfn, probe_entries, _meta2 = make_pallas_variant_fn(
            virt, frag.name, interpret=args.interpret
        )
    finally:
        _pv.variant_index_table = orig

    kjit = jax.jit(lambda e: jnp.sum(kfn(e)))

    # --- XLA baseline: vmapped sim over the same variants, lax.scan ----
    sim_one, _, positions, flat_count = make_sim_fn(
        virt, frag.name, build_matrices=False, fused_slots=True
    )
    tabs = _slot_tables(prog, [vg.spec for vg in virt.vgates], fused=True)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (  # noqa: E501
        label_strides,
        variant_index_table,
    )

    specs = [vg.spec for vg in virt.vgates]
    strides, n_inst, _fc = label_strides(specs, prog.touching)
    vidx = variant_index_table(
        prog.touching, strides, n_inst, V, clamp_to=meta["flat_count"]
    )
    touch_col = {g: i for i, g in enumerate(prog.touching)}
    chunk = max(1, (1 << 19) >> prog.num_sim_qubits)
    assert V % chunk == 0, (V, chunk)
    nb = V // chunk
    vidx_p = vidx

    def xla_step(vv):
        def body(carry, vc):
            mats = [
                tuple(jnp.asarray(t)[vc[:, touch_col[
                    prog.slots[sid].vgate_idx]]] for t in tab)
                for sid, tab in enumerate(tabs)
            ]
            rows = jax.vmap(sim_one)(mats)
            return carry + jnp.sum(rows), None

        carry, _ = jax.lax.scan(
            body, jnp.zeros(()), vv.reshape(nb, chunk, -1)
        )
        return carry

    xjit = jax.jit(xla_step)
    vdev = jnp.asarray(vidx_p)

    # --- first runs (compile) ------------------------------------------
    for key, f, a in (("pallas", kjit, probe_entries),
                      ("xla", xjit, vdev)):
        t0 = time.perf_counter()
        v = float(f(a))
        out[f"{key}_first_s"] = round(time.perf_counter() - t0, 2)
        out[f"{key}_sum"] = v
        print(f"[pv] {key} first {out[f'{key}_first_s']}s sum={v:.6f}",
              flush=True)
    assert abs(out["pallas_sum"] - out["xla_sum"]) < 1e-2 * max(
        1.0, abs(out["xla_sum"])
    ), (out["pallas_sum"], out["xla_sum"])

    times = {"pallas": [], "xla": []}
    for rep in range(args.reps):
        order = (("pallas", "xla") if rep % 2 == 0
                 else ("xla", "pallas"))
        for key in order:
            f, a = (kjit, probe_entries) if key == "pallas" \
                else (xjit, vdev)
            t0 = time.perf_counter()
            float(f(a))
            dt = time.perf_counter() - t0
            times[key].append(dt)
            print(f"[pv] rep{rep} {key} {dt:.3f}s", flush=True)
    for key in times:
        out[f"{key}_steady_s"] = round(float(np.median(times[key])), 4)
        out[f"{key}_times"] = [round(t, 4) for t in times[key]]
    out["speedup"] = round(
        out["xla_steady_s"] / out["pallas_steady_s"], 3
    )
    out["per_variant_us"] = {
        k: round(out[f"{k}_steady_s"] / V * 1e6, 2) for k in times
    }
    print(f"[pv] {json.dumps(out)}", flush=True)
    path = pathlib.Path(__file__).resolve().parent.parent / (
        "pallas_variant_probe.json"
    )
    existing = []
    if path.exists():
        existing = json.loads(path.read_text())
    existing = [e for e in existing if e.get("config") != args.config]
    path.write_text(json.dumps(existing + [out], indent=2))
    print(f"[pv] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
