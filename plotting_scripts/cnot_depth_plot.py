"""CNOT-count / depth bar chart (reference: plotting_scripts/cnot_depth_plot.py).

Reads `run.log` artifacts written by benchmark_number_of_cnots_and_depth.py
instead of hard-coding thesis numbers.
"""
import pathlib
import re
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


def collect(results_dir="benchmark_results"):
    rows = {}
    pat_in = re.compile(r"inputCirc => nCnots: (\d+); depth: (\d+)")
    pat_tin = re.compile(r"transpiledInputCirc => nCnots: (\d+); depth: (\d+)")
    pat_cut = re.compile(r"cut summary => sumNCnots: (\d+); maxDepth: (\d+)")
    for run in sorted(pathlib.Path(results_dir).glob("cnots_*/run.log")):
        text = run.read_text()
        m_in, m_tin, m_cut = (
            pat_in.search(text), pat_tin.search(text), pat_cut.search(text)
        )
        if m_in and m_tin and m_cut:
            tag = run.parent.name.rsplit("_", 1)[0].removeprefix("cnots_")
            rows[tag] = {
                "cnots": [int(m_in[1]), int(m_tin[1]), int(m_cut[1])],
                "depth": [int(m_in[2]), int(m_tin[2]), int(m_cut[2])],
            }
    return rows


def main(out="cnot_depth_plot.png"):
    rows = collect()
    if not rows:
        print("no cnot/depth results found under benchmark_results/")
        return
    tags = list(rows)
    fig, axes = plt.subplots(1, 2, figsize=(max(8, len(tags) * 2), 4))
    labels = ["input", "transpiled input", "transpiled cut"]
    for ax, key in zip(axes, ("cnots", "depth")):
        w = 0.27
        for j, lab in enumerate(labels):
            ax.bar(
                [i + (j - 1) * w for i in range(len(tags))],
                [rows[t][key][j] for t in tags],
                w, label=lab,
            )
        ax.set_xticks(range(len(tags)))
        ax.set_xticklabels(tags, rotation=30, ha="right")
        ax.set_title(key)
    axes[0].legend()
    fig.tight_layout()
    fig.savefig(out, dpi=150)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
