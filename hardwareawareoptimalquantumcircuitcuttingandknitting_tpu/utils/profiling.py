"""Structured phase timing + JAX profiler integration.

The reference's observability is two ad-hoc wall-clock pairs
(qvm/run.py:17-20,35,60-67 and the datetime pair around solve() in
benchmark.py:43-50).  Here every pipeline phase reports into one
:class:`Tracer` that can be printed, serialized to JSON, and optionally
wrapped in a device-level ``jax.profiler`` trace (viewable in
TensorBoard/Perfetto).
"""
from __future__ import annotations

import contextlib
import json
import pathlib
import time
from dataclasses import dataclass, field


@dataclass
class Phase:
    name: str
    seconds: float
    meta: dict = field(default_factory=dict)


@dataclass
class Tracer:
    """Collects named phase timings; optionally drives jax.profiler."""

    phases: list[Phase] = field(default_factory=list)
    profile_dir: str | None = None
    _profiling: bool = False

    @contextlib.contextmanager
    def phase(self, name: str, **meta):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases.append(Phase(name, time.perf_counter() - t0, meta))

    def start_device_trace(self) -> None:
        """Begin a jax.profiler trace (HLO timelines, per-op device time)."""
        if self.profile_dir is None or self._profiling:
            return
        import jax

        pathlib.Path(self.profile_dir).mkdir(parents=True, exist_ok=True)
        jax.profiler.start_trace(self.profile_dir)
        self._profiling = True

    def stop_device_trace(self) -> None:
        if not self._profiling:
            return
        import jax

        jax.profiler.stop_trace()
        self._profiling = False

    def total(self, name: str | None = None) -> float:
        return sum(
            p.seconds for p in self.phases if name is None or p.name == name
        )

    def report(self) -> dict:
        return {
            "phases": [
                # meta spreads after, but never overwrites, the measured
                # fields — a meta key named "seconds" would otherwise
                # silently replace the timing in the artifact
                {
                    "name": p.name,
                    "seconds": round(p.seconds, 6),
                    **{
                        k: v for k, v in p.meta.items()
                        if k not in ("name", "seconds")
                    },
                }
                for p in self.phases
            ],
            "total_seconds": round(sum(p.seconds for p in self.phases), 6),
        }

    def save(self, path: str | pathlib.Path) -> None:
        pathlib.Path(path).write_text(json.dumps(self.report(), indent=2))

    def __str__(self) -> str:
        lines = [
            f"  {p.name:<24} {p.seconds:9.4f}s"
            + (f"  {p.meta}" if p.meta else "")
            for p in self.phases
        ]
        return "phase timings:\n" + "\n".join(lines)
