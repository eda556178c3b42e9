"""Fidelity bar chart (reference: plotting_scripts/fid_plot.py).

Unlike the reference (which hard-codes thesis-run numbers), this script
reads `metrics.json`/`run.log` artifacts from benchmark_results/ run
directories and plots orig-vs-cut fidelities per config.  With no run
directories it falls back to the committed noisy-parity artifact
(noisy_parity.json), plotting ours next to the reference's recorded
values for every config.
"""
import json
import pathlib
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def collect(results_dir="benchmark_results"):
    rows = {}
    for run in sorted(pathlib.Path(results_dir).glob("*/run.log")):
        text = run.read_text()
        fids = {
            key: float(m.group(1))
            for key, pat in [
                ("input", r"inputCircFidelity: ([0-9.e+-]+)"),
                ("cut", r"cutCircFidelity: ([0-9.e+-]+)"),
                ("cutVsUncut", r"cutVsUncutFidelity: ([0-9.e+-]+)"),
            ]
            if (m := re.search(pat, text))
        }
        if fids:
            tag = run.parent.name.rsplit("_", 1)[0]
            rows[tag] = fids
    return rows


def collect_parity_artifact():
    """Fallback: the committed reference-parity table (noisy_parity.json,
    written by benchmarks/noisy_parity.py) with the reference's recorded
    values alongside ours."""
    art = pathlib.Path(__file__).resolve().parent.parent / (
        "noisy_parity.json"
    )
    if not art.exists():
        return {}
    rows = {}
    for key, r in sorted(json.loads(art.read_text()).items()):
        rows[key] = {
            "input": r["fid_orig"],
            "cut": r["fid_cut"],
            "ref input": r.get("ref_orig"),
            "ref cut": r.get("ref_cut"),
        }
    return rows


def main(out="fid_plot.png"):
    rows = collect()
    series = ["input", "cut"]
    if not rows:
        rows = collect_parity_artifact()
        series = ["ref input", "input", "ref cut", "cut"]
    if not rows:
        print("no fidelity results found (benchmark_results/ or "
              "noisy_parity.json)")
        return
    tags = list(rows)
    x = range(len(tags))
    w = 0.8 / len(series)
    fig, ax = plt.subplots(figsize=(max(6, len(tags) * 1.5), 4))
    for s_i, s in enumerate(series):
        vals = [rows[t].get(s) or 0 for t in tags]
        off = (s_i - (len(series) - 1) / 2) * w
        ax.bar([i + off for i in x], vals, w, label=s)
    ax.set_xticks(list(x))
    ax.set_xticklabels(tags, rotation=30, ha="right")
    ax.set_ylabel("Hellinger fidelity")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}: {json.dumps(rows)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
