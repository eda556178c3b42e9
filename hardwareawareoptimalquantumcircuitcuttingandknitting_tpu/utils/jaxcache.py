"""Persistent XLA compilation cache.

Two environment quirks make compilation the dominant cost here: the TPU is
reached through a tunnel (~60 s per program) and the host has a single CPU
core.  Caching compiled executables on disk amortises both across processes
and benchmark rounds.
"""
from __future__ import annotations

import os
import pathlib

_enabled = False


def enable_cache(directory: str | os.PathLike | None = None) -> None:
    global _enabled
    if _enabled:
        return
    import jax

    if directory is None:
        directory = (
            pathlib.Path(__file__).resolve().parent.parent.parent
            / ".jax_cache"
        )
    # exact f32 gate arithmetic FIRST and unguarded: TPU XLA's default
    # matmul precision rounds f32 dot operands to bf16 (measured ~1e-4
    # per-fragment probability error); 'highest' reproduces the Pallas
    # kernel and the CPU engine bit-for-bit.  This must never be skipped
    # because a CACHE config failed (CLAUDE.md hard rule).
    jax.config.update("jax_default_matmul_precision", "highest")
    try:
        jax.config.update("jax_compilation_cache_dir", str(directory))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
    except Exception:
        # the cache is an optimisation; losing it must not be fatal
        pass
    _enabled = True
