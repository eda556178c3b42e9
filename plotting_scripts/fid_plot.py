"""Fidelity bar chart (reference: plotting_scripts/fid_plot.py).

Unlike the reference (which hard-codes thesis-run numbers), this script
reads `metrics.json`/`run.log` artifacts from benchmark_results/ run
directories and plots orig-vs-cut fidelities per config.
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


def main(out="fid_plot.png"):
    rows = collect()
    if not rows:
        print("no fidelity results found under benchmark_results/")
        return
    tags = list(rows)
    orig = [rows[t].get("input", 0) for t in tags]
    cut = [rows[t].get("cut", 0) for t in tags]
    x = range(len(tags))
    w = 0.38
    fig, ax = plt.subplots(figsize=(max(6, len(tags) * 1.3), 4))
    ax.bar([i - w / 2 for i in x], orig, w, label="orig")
    ax.bar([i + w / 2 for i in x], cut, w, label="cut")
    ax.set_xticks(list(x))
    ax.set_xticklabels(tags, rotation=30, ha="right")
    ax.set_ylabel("Hellinger fidelity")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}: {json.dumps(rows)}")


if __name__ == "__main__":
    main(*sys.argv[1:])
