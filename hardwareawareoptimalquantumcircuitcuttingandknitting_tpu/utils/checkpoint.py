"""Checkpoint / resume for the cut-simulate-knit pipeline.

The reference serializes nothing — solver state, cut plans and
quasi-distributions are all terminal (SURVEY §5).  Here the two expensive
artifacts are both on-disk formats:

  * the cut plan (cutter/plan.py — JSON, solve once / simulate many);
  * per-fragment variant results (this module — one ``.npz`` per run),
    so the knit / projection / fidelity stages can be re-run, re-sharded
    or resumed after interruption without re-simulating.
"""
from __future__ import annotations

import json
import pathlib

import numpy as np

from ..ops.variant_engine import FragmentResult

_MANIFEST = "fragment_results.json"


def checkpoint_fingerprint(virt) -> str:
    """Stable identity of a virtual circuit's result layout: fragment
    names, per-fragment touching vgates / clbit layout / variant counts.
    Saved with checkpoints so resume refuses results from a different
    circuit or cut plan."""
    import hashlib

    parts = [str(virt.num_clbits)]
    for reg in virt.fragments:
        prog = virt.programs[reg.name]
        parts.append(
            f"{reg.name}|{prog.num_sim_qubits}|{sorted(prog.touching)}|"
            f"{sorted(prog.clbit_sources.items())}|"
            f"{virt.num_instantiations(reg.name)}"
        )
    return hashlib.sha256("\n".join(parts).encode()).hexdigest()


def save_fragment_results(
    results: list[FragmentResult],
    directory: str | pathlib.Path,
    fingerprint: str | None = None,
) -> pathlib.Path:
    """Write one .npz per fragment plus a manifest; returns the dir."""
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    entries = []
    for res in results:
        fname = f"frag_{res.name}.npz"
        np.savez_compressed(
            directory / fname,
            values=np.asarray(res.values),
            bit_positions=np.asarray(res.bit_positions, dtype=np.int64),
            touching=np.asarray(res.touching, dtype=np.int64),
        )
        entries.append({"name": res.name, "file": fname})
    manifest = {"fingerprint": fingerprint, "fragments": entries}
    (directory / _MANIFEST).write_text(json.dumps(manifest, indent=2))
    return directory


def load_fragment_results(
    directory: str | pathlib.Path,
    expect_fingerprint: str | None = None,
) -> list[FragmentResult] | None:
    """Load a checkpoint.  With ``expect_fingerprint``, returns None when
    the stored fingerprint is absent or different (stale checkpoint)."""
    directory = pathlib.Path(directory)
    manifest = json.loads((directory / _MANIFEST).read_text())
    if isinstance(manifest, list):  # pre-fingerprint layout
        manifest = {"fingerprint": None, "fragments": manifest}
    if (
        expect_fingerprint is not None
        and manifest.get("fingerprint") != expect_fingerprint
    ):
        return None
    out = []
    for entry in manifest["fragments"]:
        data = np.load(directory / entry["file"])
        out.append(
            FragmentResult(
                entry["name"],
                data["values"],
                [int(x) for x in data["bit_positions"]],
                [int(x) for x in data["touching"]],
            )
        )
    return out


def has_checkpoint(directory: str | pathlib.Path) -> bool:
    return (pathlib.Path(directory) / _MANIFEST).exists()
