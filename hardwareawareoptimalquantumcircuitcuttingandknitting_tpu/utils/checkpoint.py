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


def checkpoint_fingerprint(virt, dtype=None) -> str:
    """Identity of a virtual circuit's results: fragment names, variant
    layout (touching order matters — it is the variant-axis order), clbit
    layout, AND the gate content itself (op kinds, axes and matrices), so
    a re-parameterised same-structure ansatz gets a different fingerprint.
    Saved with checkpoints so resume refuses stale results.

    ``dtype``: the engine's state-storage dtype.  bf16 (quantized
    serving) results carry ~2^-8 rounding, so an exact f32 run must
    never resume them (and vice versa) — the dtype is part of the
    identity."""
    import hashlib

    h = hashlib.sha256()
    if dtype is not None and np.dtype(dtype) != np.float32:
        # non-default storage dtype joins the identity; f32 fingerprints
        # stay byte-identical to pre-bf16 checkpoints
        h.update(f"dtype={np.dtype(dtype).name}|".encode())
    h.update(str(virt.num_clbits).encode())
    for reg in virt.fragments:
        prog = virt.programs[reg.name]
        h.update(
            f"{reg.name}|{prog.num_sim_qubits}|{list(prog.touching)}|"
            f"{sorted(prog.clbit_sources.items())}|"
            f"{virt.num_instantiations(reg.name)}".encode()
        )
        for op in prog.ops:
            if op[0] in ("u", "u_aux"):
                h.update(f"{op[0]}|{op[2]}".encode())
                h.update(np.ascontiguousarray(
                    np.asarray(op[1], dtype=complex)
                ).tobytes())
            else:
                h.update(f"{op[0]}|{op[1]}|{op[2]}".encode())
    for vg in virt.vgates:
        spec = vg.spec
        coef = np.ascontiguousarray(np.asarray(spec.coef, dtype=np.float64))
        # gate name + endpoint variant circuits, not just coef: cx/cy/cz
        # share an identical coef table (conjugated-cz construction) but
        # produce different results, so coef alone collides
        h.update(f"{spec.gate_name}|{list(spec.owner_side)}".encode())
        h.update(str(coef.shape).encode())
        h.update(coef.tobytes())
        for pair in spec.endpoints:
            for ev in pair:
                h.update(b"m" if ev.measure else b".")
                for mat in (ev.pre, ev.post):
                    h.update(np.ascontiguousarray(
                        np.asarray(mat, dtype=complex)
                    ).tobytes())
    return h.hexdigest()


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
    # atomic publish: a kill mid-write must not leave a truncated manifest
    # that poisons the next run's resume
    tmp = directory / (_MANIFEST + ".tmp")
    tmp.write_text(json.dumps(manifest, indent=2))
    tmp.replace(directory / _MANIFEST)
    return directory


def load_fragment_results(
    directory: str | pathlib.Path,
    expect_fingerprint: str | None = None,
) -> list[FragmentResult] | None:
    """Load a checkpoint.  With ``expect_fingerprint``, returns None when
    the stored fingerprint is absent or different (stale checkpoint)."""
    directory = pathlib.Path(directory)
    try:
        manifest = json.loads((directory / _MANIFEST).read_text())
    except (OSError, json.JSONDecodeError):
        # corrupt/unreadable checkpoint: resume must fall back to
        # re-simulation, not abort the run
        return None
    if isinstance(manifest, list):  # pre-fingerprint layout
        manifest = {"fingerprint": None, "fragments": manifest}
    if (
        expect_fingerprint is not None
        and manifest.get("fingerprint") != expect_fingerprint
    ):
        return None
    out = []
    for entry in manifest["fragments"]:
        try:
            data = np.load(directory / entry["file"])
        except (OSError, ValueError):
            return None  # missing/corrupt fragment file: re-simulate
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
