"""Quantitative noisy-backend parity table.

Reproduces the reference's recorded noisy-fidelity experiment
(benchmark.py:94-103: FakeKolkataV2 at 1000 shots; results table at
plotting_scripts/fid_plot.py:8-22 / BASELINE.md) under the reference's
ACTUAL execution semantics, which we derived from its code:

* Both legs go to the backend UNTRANSPILED (`backend.run(circuit)` at
  Utilities.py:44 and qvm/run.py:42 — the transpile call at
  qvm/run.py:40-43 is commented out).  Aer binds a QuantumError only to
  (basis-gate name, calibrated qubits) pairs, so h/t/cz/cp and cx on
  uncoupled pairs execute noise-free.

* fid_orig = hellinger(uncut ideal @1000 shots, uncut noisy @1000 shots)
  where "noisy" = readout error on every measured qubit + cx error on
  the chain pairs that happen to lie on the heavy-hex coupling map.
  Check: ghz-24 ref 0.731 = (1 - 1.27%)^24 — readout-dominated, not
  SWAP-inflated.

* fid_cut: the fragment instantiations' gates match NO calibration
  entry, so the reference's "noisy" cut leg is effectively ideal; its
  recorded cut fidelities are pure two-sided 1000-shot sampling
  (ghz-24 0.99979, aqft-6 0.952, sup-12 0.781, sup-20 2.07e-3).  We
  reproduce exactly that: hellinger between two independent 1000-shot
  ideal knits.  (sup-25's recorded 1.0 is a reference artifact — two
  1000-shot samples of a 2^25-outcome near-flat distribution cannot
  overlap; see the table footnote.)

* --calibrated additionally records an HONEST cut leg our framework
  supports and the reference does not: fragments routed onto the
  topology with per-qubit calibrated gate + readout noise
  (fid_cut_calibrated), trajectory count scaled to fragment width.

Usage:
    python benchmarks/noisy_parity.py [--configs add,ghz] [--shots 1000]
        [--calibrated] [--out noisy_parity.json]

Writes results incrementally (safe to interrupt / rerun per config) and
regenerates NOISY_TABLE.md next to the JSON.
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

# This is a host-scale statistical experiment whose uncut legs build up to
# 2^25-amplitude states: big-state work runs on the CPU host (CLAUDE.md —
# tunneled-TPU compile time scales with the largest buffer; >15 min at
# 2^24).  The TPU noisy legs live in benchmarks/noisy_streamed_tpu.py.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
    prune_distribution,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.noise import (
    fake_kolkata_v2,
    run_noisy_virtual_circuit,
    simulate_noisy_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sampling import (
    sample_distribution,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)

# (name, n, depth, P, Q, reference fid_orig, reference fid_cut)
# — BASELINE.md "Hellinger fidelity" table / fid_plot.py:8-22
CONFIGS = [
    ("add", 10, 1, 2, 9, 0.878, 0.991),
    ("aqft", 6, 2, 2, 5, 0.966, 0.952),
    ("ghz", 24, 1, 2, 12, 0.731, 0.99979),
    ("hwe", 10, 1, 2, 5, 0.863, 0.981),
    ("sup", 12, 1, 2, 10, 0.126, 0.781),
    ("sup", 20, 1, 2, 10, 1.27e-05, 2.07e-03),
    ("sup", 25, 1, 2, 13, 1.97e-31, 1.0),
    ("syc", 12, 2, 2, 10, 0.181, 0.963),
]

# label-space threshold above which the cut legs run streamed
STREAM_LABELS = 2000


def calibrated_traj(frag_qubits: int) -> int:
    """Trajectory count for the honest calibrated cut leg, by the widest
    fragment simulation (fragments are small, so the budget can be big —
    the round-2 table's error was sizing this by the FULL circuit width,
    which starved ghz-24's 12-qubit fragments down to 3 trajectories)."""
    if frag_qubits <= 12:
        return 64
    if frag_qubits <= 16:
        return 32
    return 8


def run_config(name, n, depth, P, Q, shots=1000, seed=0, log=print,
               calibrated=False, relaxation=False):
    t0 = time.time()
    # fixed generator seed: sup/syc draw random 1q gates per call (the
    # reference averages 3 unseeded runs; a pinned instance makes the
    # committed artifact reproducible)
    circ = genCirc(name, n, depth, seed=seed + 42)
    cutter = Cutter(
        circ, maxNPartitions=P, maxNQubitsPerPartition=Q,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve(), f"{name}-{n} unsat"
    _, _, _, cut_circ, _ = cutter.getResultCircs()
    virt = VirtualCircuit(cut_circ)
    labels = 1
    for vg in virt.vgates:
        labels *= vg.spec.num_instantiations

    nm = fake_kolkata_v2()
    nm.untranspiled = True  # the reference's actual run semantics
    log(f"[{name}-{n}] labels={labels} "
        f"frag_sim={[p.num_sim_qubits for p in virt.programs.values()]}")

    # --- uncut legs ------------------------------------------------------
    ideal = simulate_circuit(circ)
    ideal_s = sample_distribution(ideal, shots, seed)
    log(f"[{name}-{n}] uncut ideal done {time.time()-t0:.0f}s")
    noisy = simulate_noisy_circuit(circ, nm, shots=shots, seed=seed + 1)
    fid_orig = hellinger_fidelity(ideal_s, noisy)
    log(f"[{name}-{n}] fid_orig={fid_orig:.6g} {time.time()-t0:.0f}s")

    # --- cut legs: two independent 1000-shot ideal knits ------------------
    # At supremacy scale the reference's recorded cut fidelity is SET by
    # its QuasiDistr pruning (ACCURACY=1e-5, quasi_distr.py:3,8-10): every
    # per-label merge and every vgate-reduction level drops |v| <= 1e-5,
    # concentrating the sampled knit's support.  The sparse path below is
    # that exact counts -> QuasiDistr -> hierarchical-knit pipeline
    # (virt/sparse_knit.py); dense engines + a final prune cannot
    # reproduce the cascade (measured: sup-20 fid_cut 1.6e-5 dense-pruned
    # vs the reference's 2.07e-3).
    if labels > STREAM_LABELS:
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.sparse_knit import (
            sampled_sparse_fragment_rows,
            sparse_knit,
        )

        engine = "sparse"

        def sparse_leg(sd):
            rows = {
                reg.name: sampled_sparse_fragment_rows(
                    virt, reg.name, shots, seed=sd * 131 + i
                )
                for i, reg in enumerate(virt.fragments)
            }
            q = sparse_knit(virt, rows=rows)
            return q.nearest_probability_distribution().to_dict()

        cut_a = sparse_leg(seed + 2)
        log(f"[{name}-{n}] cut leg A done {time.time()-t0:.0f}s")
        cut_b = sparse_leg(seed + 3)
    else:
        engine = "auto"
        cut_a, _ = run_virtual_circuit(
            virt, shots=shots, seed=seed + 2, engine=engine
        )
        log(f"[{name}-{n}] cut leg A done {time.time()-t0:.0f}s")
        cut_b, _ = run_virtual_circuit(
            virt, shots=shots, seed=seed + 3, engine=engine
        )
        cut_a = prune_distribution(cut_a)
        cut_b = prune_distribution(cut_b)
    fid_cut = hellinger_fidelity(cut_a, cut_b)
    fid_cut_vs_uncut = hellinger_fidelity(ideal_s, cut_a)
    log(f"[{name}-{n}] fid_cut={fid_cut:.6g} "
        f"cutVsUncut={fid_cut_vs_uncut:.6g} {time.time()-t0:.0f}s")

    out = {
        "config": f"{name}_{n}_{depth}_{P}_{Q}",
        "labels": labels,
        "shots": shots,
        "engine": engine,
        "fid_orig": float(fid_orig),
        "fid_cut": float(fid_cut),
        "fid_cut_vs_uncut": float(fid_cut_vs_uncut),
    }

    # --- honest calibrated cut leg (ours only; not a reference quantity) --
    if calibrated or relaxation:
        nmc = fake_kolkata_v2(relaxation=relaxation)
        widest = max(p.num_sim_qubits for p in virt.programs.values())
        nmc.trajectories = calibrated_traj(widest)
        cut_noisy, _ = run_noisy_virtual_circuit(
            virt, nmc, shots=shots, seed=seed + 4,
            engine="streamed" if labels > STREAM_LABELS else "auto",
        )
        col = "fid_cut_relax" if relaxation else "fid_cut_calibrated"
        out[col] = float(hellinger_fidelity(cut_a, cut_noisy))
        out["calibrated_trajectories"] = nmc.trajectories
        log(f"[{name}-{n}] {col}={out[col]:.6g}"
            f" {time.time()-t0:.0f}s")

    out["wall_s"] = round(time.time() - t0, 1)
    return out


def write_table(results: dict, path: pathlib.Path):
    lines = [
        "# Noisy-backend parity table",
        "",
        "Generated by `python benchmarks/noisy_parity.py` under the",
        "reference's actual execution semantics (see that file's docstring",
        "for the derivation): circuits reach the fake backend UNTRANSPILED",
        "(Utilities.py:44, qvm/run.py:40-43), so Aer binds noise only to",
        "(basis gate, calibrated qubits) pairs — the uncut leg carries",
        "per-qubit readout error plus cx error on coupling-map pairs, and",
        "the fragment instantiations execute noise-free, making the",
        "reference's recorded cut fidelities pure two-sided 1000-shot",
        "sampling.  Reference values: BASELINE.md / fid_plot.py:8-22.",
        "",
        "| Config | ref orig | ours orig | ref cut | ours cut | ours cut (calibrated noise) | + T1/T2 relaxation |",
        "|---|---|---|---|---|---|---|",
    ]
    for (name, n, d, P, Q, ref_o, ref_c) in CONFIGS:
        key = f"{name}_{n}_{d}_{P}_{Q}"
        r = results.get(key)
        ours_o = f"{r['fid_orig']:.3g}" if r else "—"
        ours_c = f"{r['fid_cut']:.3g}" if r else "—"
        cal = (f"{r['fid_cut_calibrated']:.3g}"
               if r and "fid_cut_calibrated" in r else "—")
        rel = (f"{r['fid_cut_relax']:.3g}"
               if r and "fid_cut_relax" in r else "—")
        lines.append(
            f"| {key} | {ref_o:.3g} | {ours_o} | {ref_c:.3g} | {ours_c} |"
            f" {cal} | {rel} |"
        )
    lines += [
        "",
        "Anchors: ghz-24 orig 0.731 = (1 - ~1.30%)^24 is readout error on",
        "24 measured bits — reproduced by the calibrated per-qubit readout",
        "vectors; the supremacy-class rows are 1000-shot sampling over 2^n",
        "near-flat outcomes (gate noise cannot bind: sup/syc use cz, not a",
        "Kolkata basis gate).  The sup-20/25 cut legs run the reference's",
        "exact sparse data path (counts -> QuasiDistr -> hierarchical knit",
        "with ACCURACY=1e-5 pruning at every level, virt/sparse_knit.py):",
        "that cascade concentrates the sampled knit's support and is what",
        "sets the fidelity scale of these rows — a dense knit with only a",
        "final prune measures 1.6e-5 where the cascade gives 5.2e-2 and",
        "the reference recorded 2.07e-3 (the residual spread is set by the",
        "random circuit instance and the chosen cut set).  sup-25's",
        "reference cut value of 1.0 is an artifact (two 1000-shot samples",
        "of a near-flat 2^25-outcome distribution cannot overlap; the",
        "reference's own exception swallow at qvm/run.py:49-57 drops",
        "fragment results for exactly this config class).",
        "",
        "The last column is a capability the reference does not have: the",
        "cut fragments simulated with FULL calibrated device noise",
        "(topology-routed, per-qubit gate + readout rates, Pauli-twirl",
        "trajectories scaled to fragment width) — the number a real device",
        "run would approach.  The sup-20/25 cells are omitted: at 1000",
        "shots those rows are sampling-collapsed, so calibrated gate noise",
        "cannot move them measurably (the column would equal the parity",
        "column at ~30x the compute).",
        "",
        "## Thermal relaxation (T1/T2)",
        "",
        "The '+ T1/T2 relaxation' column re-runs the calibrated cut leg",
        "with `fake_kolkata_v2(relaxation=True)` (same depolarising/",
        "readout calibration plus per-qubit T1 ~100us / T2 ~70us vectors,",
        "`--relaxation`): every physical gate additionally amplitude+",
        "phase-damps each touched qubit for the gate duration, via",
        "importance-sampled per-site Kraus banks in the same balanced-",
        "trajectory machinery (batched / streamed / sampled engines).",
        "The reference's untranspiled semantics binds no relaxation",
        "either (qiskit-aer attaches thermal_relaxation_error through",
        "calibration entries the untranspiled gates never match), so the",
        "column is ours-only, and sits below the depolarising-only",
        "calibrated column exactly where circuits idle the longest",
        "(add-10's deep Cuccaro chain loses the most).  Unbiasedness and",
        "the non-unital |0>-bias are locked by `tests/test_relaxation.py`",
        "(dense density-matrix oracle differential, analytic 1-qubit",
        "gamma check, engine agreement on a cut GHZ).",
        "",
    ]
    path.write_text("\n".join(lines))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="",
                    help="comma-separated name or name_n filters")
    ap.add_argument("--shots", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--calibrated", action="store_true",
                    help="also record the honest calibrated-noise cut leg")
    ap.add_argument("--relaxation", action="store_true",
                    help="record the calibrated cut leg with per-qubit "
                    "T1/T2 thermal relaxation on top (fid_cut_relax)")
    ap.add_argument("--out", default=str(
        pathlib.Path(__file__).resolve().parent.parent / "noisy_parity.json"
    ))
    args = ap.parse_args()

    out = pathlib.Path(args.out)
    results = {}
    if out.exists():
        results = json.loads(out.read_text())

    wanted = [w for w in args.configs.split(",") if w]
    for (name, n, d, P, Q, ref_o, ref_c) in CONFIGS:
        key = f"{name}_{n}_{d}_{P}_{Q}"
        if wanted and not any(
            w == name or w == f"{name}_{n}" for w in wanted
        ):
            continue
        if key in results and not wanted:
            print(f"[skip] {key} (already recorded)")
            continue
        res = run_config(name, n, d, P, Q, shots=args.shots, seed=args.seed,
                         calibrated=args.calibrated,
                         relaxation=args.relaxation)
        res["ref_orig"] = ref_o
        res["ref_cut"] = ref_c
        for col in ("fid_cut_calibrated", "fid_cut_relax"):
            if key in results and col in results[key]:
                res.setdefault(col, results[key][col])
        results[key] = res
        out.write_text(json.dumps(results, indent=2))
        write_table(results, out.parent / "NOISY_TABLE.md")
        print(json.dumps(res))


if __name__ == "__main__":
    main()
