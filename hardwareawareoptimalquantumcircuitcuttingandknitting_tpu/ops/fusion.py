"""Gate fusion: collapse adjacent gates into single matrices.

Every gate application on an n-qubit state streams the whole [2, 2^n]
tensor through HBM, so op count is the direct cost driver of the exact
engines.  This pass merges, order-preservingly:

  * runs of 1q gates on the same qubit -> one 2x2;
  * 1q gates into the next/previous 2q gate touching that qubit;
  * consecutive 2q gates on the same qubit pair (either orientation)
    -> one 4x4.

Typical benchmark circuits (supremacy/sycamore layers of 1q gates
between couplers) shrink 2-3x.  Used on the exact paths only: the
trajectory noise engine needs per-physical-gate sites, so it keeps the
unfused stream.

Convention (ops/statevector.apply_matrix): ``axes[0]`` is the most
significant bit of the matrix index.
"""
from __future__ import annotations

import numpy as np

_I2 = np.eye(2, dtype=complex)


def _swap_operands(u4: np.ndarray) -> np.ndarray:
    """Reorder a 4x4 matrix from qubit order (a, b) to (b, a)."""
    perm = [0, 2, 1, 3]
    return u4[np.ix_(perm, perm)]


def _kron2(ua: np.ndarray, ub: np.ndarray) -> np.ndarray:
    """4x4 acting as ua on the first (most significant) operand, ub on
    the second."""
    return np.kron(ua, ub)


class _Fuser:
    def __init__(self):
        self.out: list[tuple[np.ndarray, tuple[int, ...]]] = []
        # qubit -> pending op index in self.pending
        self.owner: dict[int, int] = {}
        self.pending: list = []  # [matrix, axes, alive]

    def _flush(self, idx: int) -> None:
        mat, axes, alive = self.pending[idx]
        if not alive:
            return
        self.pending[idx][2] = False
        for q in axes:
            if self.owner.get(q) == idx:
                del self.owner[q]
        self.out.append((np.asarray(mat, dtype=complex), tuple(axes)))

    def _flush_qubit(self, q: int) -> None:
        if q in self.owner:
            self._flush(self.owner[q])

    def _start(self, mat: np.ndarray, axes: tuple[int, ...]) -> None:
        idx = len(self.pending)
        self.pending.append([np.asarray(mat, dtype=complex), axes, True])
        for q in axes:
            self.owner[q] = idx

    def add(self, mat: np.ndarray, axes: tuple[int, ...]) -> None:
        mat = np.asarray(mat, dtype=complex)
        if len(axes) == 1:
            q = axes[0]
            idx = self.owner.get(q)
            if idx is None:
                self._start(mat, axes)
                return
            pmat, paxes, _ = self.pending[idx]
            if len(paxes) == 1:
                self.pending[idx][0] = mat @ pmat
            else:  # absorb into the pending 2q
                a, b = paxes
                lift = (
                    _kron2(mat, _I2) if q == a else _kron2(_I2, mat)
                )
                self.pending[idx][0] = lift @ pmat
            return

        a, b = axes
        ia, ib = self.owner.get(a), self.owner.get(b)
        if ia is not None and ia == ib:
            pmat, paxes, _ = self.pending[ia]
            if len(paxes) == 2:  # same pair: compose
                if tuple(paxes) == (b, a):
                    mat = _swap_operands(mat)
                    a, b = paxes
                self.pending[ia][0] = mat @ pmat
                return
        # absorb pending 1q gates on a/b; flush pending 2q conflicts
        for q in (a, b):
            idx = self.owner.get(q)
            if idx is None:
                continue
            pmat, paxes, _ = self.pending[idx]
            if len(paxes) == 1:
                lift = _kron2(pmat, _I2) if q == a else _kron2(_I2, pmat)
                mat = mat @ lift
                self.pending[idx][2] = False
                del self.owner[q]
            else:
                self._flush(idx)
        self._start(mat, (a, b))

    def finish(self) -> list[tuple[np.ndarray, tuple[int, ...]]]:
        for idx in range(len(self.pending)):
            self._flush(idx)
        return self.out


def fused_stream(prog_ops: list) -> tuple[list, list[np.ndarray]]:
    """Fuse a FragmentProgram-style op stream (fixed "u"/"u_aux" entries
    interleaved with slot ops).  Fixed-gate runs between slots fuse;
    slot ops pass through as structural entries.

    Returns (skeleton, mats): skeleton entries are ("u", axes) for fused
    fixed gates (matrix in ``mats``, aligned by order of appearance) or
    the original slot tuples; the skeleton alone is the structural key
    used by the parameter-sweep binder.
    """
    skeleton: list = []
    mats: list[np.ndarray] = []
    run: list = []

    def flush():
        for m, ax in fuse_ops(run):
            skeleton.append(("u", tuple(ax)))
            mats.append(m)
        run.clear()

    for op in prog_ops:
        if op[0] in ("u", "u_aux"):
            run.append((op[1], op[2]))
        else:
            flush()
            skeleton.append(op)
    flush()
    return skeleton, mats


def fuse_ops(
    ops: list[tuple[np.ndarray, tuple[int, ...]]],
) -> list[tuple[np.ndarray, tuple[int, ...]]]:
    """Fuse a (matrix, axes) op list; 3q+ ops flush everything and pass
    through unfused."""
    fuser = _Fuser()
    for mat, axes in ops:
        if len(axes) > 2:
            for idx in range(len(fuser.pending)):
                fuser._flush(idx)
            fuser.out.append((np.asarray(mat, dtype=complex), tuple(axes)))
            continue
        fuser.add(mat, axes)
    return fuser.finish()
