"""Compiler drivers (reference: qvm/compiler/compiler.py:13-52)."""
from __future__ import annotations

from ..circuit.circuit import Circuit
from ..virt.virtual_circuit import VirtualCircuit
from .passes import GreedyDependencyBreaker, OptimalDecompositionPass
from .qubit_reuser import QubitReuser
from .types import (
    DistributedTranspilerPass,
    VirtualizationPass,
    num_virtual_gates,
)


class QVMCompiler:
    def __init__(
        self,
        virt_passes: list[VirtualizationPass] | None = None,
        dt_passes: list[DistributedTranspilerPass] | None = None,
    ):
        self._virt_passes = virt_passes or []
        self._dt_passes = dt_passes or []

    def run(self, circuit: Circuit, budget: int) -> VirtualCircuit:
        circuit = circuit.copy()
        for vpass in self._virt_passes:
            if budget == 0:
                break
            elif budget < 0:
                raise ValueError("Compiler failed to keep budget.")
            circuit = vpass.run(circuit, budget)
            budget -= num_virtual_gates(circuit)

        for dtpass in self._dt_passes:
            if isinstance(dtpass, QubitReuser):
                circuit = dtpass.run_on_circuit(circuit)
        virt = VirtualCircuit(circuit)
        for dtpass in self._dt_passes:
            if not isinstance(dtpass, QubitReuser):
                dtpass.run(virt)
        return virt


class StandardQVMCompiler(QVMCompiler):
    """reference: compiler.py:38-46."""

    def __init__(self, size_to_reach: int) -> None:
        super().__init__(
            virt_passes=[
                OptimalDecompositionPass(size_to_reach),
                GreedyDependencyBreaker(),
            ],
            dt_passes=[QubitReuser(size_to_reach)],
        )


class CutterCompiler(QVMCompiler):
    """reference: compiler.py:49-52."""

    def __init__(self, size_to_reach: int) -> None:
        super().__init__([OptimalDecompositionPass(size_to_reach)])
