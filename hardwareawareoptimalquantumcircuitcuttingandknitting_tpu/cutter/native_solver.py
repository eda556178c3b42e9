"""ctypes bindings for the native C++ cut solver (native/cutsolver.cc).

The Python solver (solver.py) is the readable reference implementation; this
binding is the hot path replacing the reference's z3 search
(src/HwAwareCutter/Cutter.py:103-124).  Falls back gracefully when the .so
has not been built (``make -C native``).
"""
from __future__ import annotations

import ctypes
import pathlib

import numpy as np

from .graph import WIRE, CutGraph
from .plan import CutDecision, CutPlan, PlanMetrics

_LIB_PATH = (
    pathlib.Path(__file__).resolve().parent.parent
    / "_native"
    / "libcutsolver.so"
)
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.solve_cut.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def solve_native(graph: CutGraph, cfg) -> CutPlan | None:
    lib = _load()
    assert lib is not None
    nv = graph.num_vertices
    if nv == 0:
        return None
    # same invalid-config behavior as the Python twin (solver.py, Cutter.py:364)
    assert cfg.num_partitions <= nv
    ne = len(graph.edges)
    i32 = lambda xs: np.asarray(xs, dtype=np.int32)
    i64 = lambda xs: np.asarray(xs, dtype=np.int64)

    eu = i32([e[0] for e in graph.edges])
    ev = i32([e[1] for e in graph.edges])
    ek = i32([e[2] for e in graph.edges])
    init = i32(graph.initial)
    caps = i64(cfg.caps)

    out_assign = np.zeros(nv, dtype=np.int32)
    out_cu = np.zeros(ne, dtype=np.int32)
    out_cv = np.zeros(ne, dtype=np.int32)
    out_ck = np.zeros(ne, dtype=np.int32)
    out_ct = np.zeros(ne, dtype=np.int32)
    out_nc = np.zeros(1, dtype=np.int32)
    out_metrics = np.zeros(8, dtype=np.int64)
    out_qp = np.zeros(cfg.num_partitions, dtype=np.int64)
    out_cp = np.zeros(cfg.num_partitions, dtype=np.int64)

    def ptr(arr):
        return arr.ctypes.data_as(ctypes.c_void_p)

    def opt(x):
        return -1 if x is None else int(x)

    ok = lib.solve_cut(
        nv, ne, ptr(eu), ptr(ev), ptr(ek), len(init), ptr(init),
        cfg.num_partitions, ptr(caps),
        opt(cfg.force_n_wire_cuts), opt(cfg.force_n_gate_cuts),
        opt(cfg.max_n_cuts), opt(cfg.max_n_qpd_cuts),
        opt(cfg.max_cuts_per_partition), opt(cfg.spare_capacity),
        ptr(out_assign), ptr(out_cu), ptr(out_cv), ptr(out_ck), ptr(out_ct),
        ptr(out_nc), ptr(out_metrics), ptr(out_qp), ptr(out_cp),
    )
    if ok == -2:
        raise ValueError(
            "native solver: a search leaf accumulated more than 31 cut "
            "edges with teleport enumeration enabled — tighten maxNCuts/"
            "maxNQpdCuts or use the pure-Python solver"
        )
    if not ok:
        return None

    nc = int(out_nc[0])
    cuts = [
        CutDecision(
            (int(out_cu[i]), int(out_cv[i])),
            "wire" if out_ck[i] == WIRE else "gate",
            bool(out_ct[i]),
        )
        for i in range(nc)
    ]
    metrics = PlanMetrics(
        S=int(out_metrics[0]), A=int(out_metrics[1]), L=int(out_metrics[2]),
        Q=int(out_metrics[3]), C=int(out_metrics[4]),
        Q_p=[int(x) for x in out_qp], C_p=[int(x) for x in out_cp],
        n_wire_cuts=int(out_metrics[5]), n_gate_cuts=int(out_metrics[6]),
    )
    return CutPlan(
        cfg.num_partitions, [int(x) for x in out_assign], cuts, metrics,
        bool(out_metrics[7]),
    )
