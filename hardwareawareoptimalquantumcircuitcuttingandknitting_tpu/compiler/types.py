"""Compiler pass interfaces (reference: qvm/compiler/types.py:8-23)."""
from __future__ import annotations

import abc

from ..circuit.circuit import Circuit
from ..virt.virtual_circuit import VirtualCircuit


class VirtualizationPass(abc.ABC):
    """A compiler pass that inserts virtual operations into a circuit."""

    @abc.abstractmethod
    def run(self, circuit: Circuit, budget: int) -> Circuit:
        ...


class DistributedTranspilerPass(abc.ABC):
    """A compiler pass that modifies a virtual circuit (e.g. qubit reuse)."""

    @abc.abstractmethod
    def run(self, virt: VirtualCircuit) -> None:
        ...


def num_virtual_gates(circuit: Circuit) -> int:
    """Reference: qvm/compiler/util.py:6-7."""
    return sum(1 for ins in circuit.instructions if ins.name == "vgate")
