"""Model-vs-measured roofline report (PERF.md's tables; VERDICT r4 #6).

Walks the REAL execution plans of the serving engines through
``ops/roofline.py`` and prints, per config:

  * the exact streamed-engine step model (hoisted tree-shared banks —
    the serving shape) and its light-speed at the v5e's nominal HBM
    bandwidth, next to the measured steady step where a committed
    artifact carries one;
  * the SAMPLED/collapse-mode estimate model (qft-16 flagship): bytes
    per executed label row for the XLA collapse builder and the
    VMEM-kernel HBM floor, with the measured estimate wall from
    qft16_sampled*.json.

Host-only (CPU solves + plan walks; no device work).  Usage:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \\
        python benchmarks/roofline_report.py [--out roofline_report.json]
"""
from __future__ import annotations

import argparse
import json
import math
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent

# measured steady steps from the committed measurement artifacts
# (BENCH_TABLE_TPU.md / PERF.md provenance noted per row)
MEASURED_EXACT = {
    "sup25": (3.44, "pallas_step_ab.json: engine='pallas' full step"),
    "sup20": (0.355, "pallas_step_ab.json: XLA banked+staged step"),
    "aqft16": (0.090, "northstar_tpu.json r3s3 exact steady"),
    "hwe16": (0.038, "northstar_tpu.json r3s3 exact steady"),
}


def _build(name):
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    spec = {
        "sup25": ("sup", 25, 1, 2, 13),
        "sup20": ("sup", 20, 1, 2, 10),
        "aqft16": ("aqft", 16, 1, 2, 10),
        "hwe16": ("hwe", 16, 5, 2, 10),
    }[name]
    circ = genCirc(spec[0], spec[1], spec[2])
    cutter = Cutter(circ, maxNPartitions=spec[3],
                    maxNQubitsPerPartition=spec[4],
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def exact_rows():
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (  # noqa: E501
        V5E_HBM_BYTES_PER_S,
        streamed_step_model,
    )

    rows = []
    for name in ("sup25", "sup20", "aqft16", "hwe16"):
        virt = _build(name)
        m = streamed_step_model(virt, share_prefix=True, hoist_banks=True)
        light = m.seconds(V5E_HBM_BYTES_PER_S)
        meas, src = MEASURED_EXACT.get(name, (None, None))
        rows.append({
            "config": name,
            "engine": "streamed exact (hoisted banks)",
            "labels": m.global_labels,
            "model_bytes": m.total_bytes,
            "light_speed_s_819GBps": round(light, 4),
            "measured_steady_s": meas,
            "measured_source": src,
            "ratio_measured_over_light": (
                round(meas / light, 2) if meas else None
            ),
        })
    return rows


def sampled_rows(samples=120_000, keep_bits=4, seed=1):
    """qft-16 collapse-mode sampled estimate: model the EXACT row count
    the scan executes for this (samples, seed, lhs) — the same dedup +
    per-sample measuring expansion ops/qpd_sampling.sampled_knit does —
    then the per-row HBM bytes for the XLA builder and the VMEM-kernel
    floor."""
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (  # noqa: E501
        _collapse_flags,
        _expand_measuring_counts,
        sample_label_counts,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (  # noqa: E501
        V5E_HBM_BYTES_PER_S,
        sampled_estimate_model,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    circ = genCirc("qft", 16, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=15,
                    gammaMode=True)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    flags = _collapse_flags(virt, "auto")

    uniq, counts = sample_label_counts(virt, samples, seed, method="lhs")
    rows_x, _ = _expand_measuring_counts(
        virt, uniq, counts.astype(np.float64)
    )
    n_rows = int(rows_x.shape[0])

    keep = list(range(keep_bits))
    out = []
    for pallas in (False, True):
        m = sampled_estimate_model(
            virt, n_rows, keep_clbits=keep, collapse=flags,
            pallas=pallas, second_moment=True,
        )
        light = m.seconds(V5E_HBM_BYTES_PER_S)
        out.append({
            "config": "qft16 sampled marginal (collapse mode)",
            "engine": "vmem kernel (HBM floor)" if pallas
            else "xla collapse builder",
            "samples": samples,
            "executed_rows": n_rows,
            "model_bytes": m.total_bytes,
            "bytes_per_row_per_frag": [
                (n, k, b) for (n, k, b) in m.fragments
            ],
            "light_speed_s_819GBps": round(light, 4),
            "note": (
                "VMEM-resident state: HBM traffic is only the per-row "
                "output + label/u inputs, so this is a FLOOR — the "
                "binding resource is in-VMEM compute (measured "
                "66-108 us/row, collapse_ab_probe.json)"
            ) if pallas else None,
        })

    # join the measured estimate walls
    for fn, eng in (("qft16_sampled.json", "xla collapse builder"),
                    ("qft16_sampled_pallas.json",
                     "vmem kernel (HBM floor)")):
        path = REPO / fn
        if path.exists():
            d = json.loads(path.read_text())
            meas = min(
                leg["marginal_steady_s"] for leg in d["legs"]
            )
            for r in out:
                if r["engine"] == eng:
                    r["measured_steady_estimate_s"] = meas
                    r["measured_source"] = fn
                    r["ratio_measured_over_light"] = round(
                        meas / max(r["light_speed_s_819GBps"], 1e-9), 1
                    )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--samples", type=int, default=120_000)
    args = ap.parse_args()

    t0 = time.perf_counter()
    rows = exact_rows() + sampled_rows(samples=args.samples)

    print("| config | engine | model bytes | light-speed @819GB/s | "
          "measured | ratio |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        meas = r.get("measured_steady_s",
                     r.get("measured_steady_estimate_s"))
        print(
            f"| {r['config']} | {r['engine']} | "
            f"{r['model_bytes'] / 1e9:.2f} GB | "
            f"{r['light_speed_s_819GBps']} s | "
            f"{meas if meas is not None else '—'} s | "
            f"{r.get('ratio_measured_over_light') or '—'} |"
        )
    report = {
        "generated_s": round(time.perf_counter() - t0, 1),
        "rows": rows,
    }
    if args.out:
        pathlib.Path(args.out).write_text(json.dumps(report, indent=2))
    print(json.dumps({
        "metric": "roofline_report_rows", "value": len(rows),
        "unit": "rows",
    }))


if __name__ == "__main__":
    main()
