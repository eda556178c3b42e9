"""hardwareawareoptimalquantumcircuitcuttingandknitting_tpu

TPU-native, first-party rebuild of the hardware-aware optimal quantum circuit
cutting & knitting pipeline (reference:
thangktran/HardwareAwareOptimalQuantumCircuitCuttingAndKnitting).

Layers (cf. SURVEY.md §1):
  circuit/   — typed circuit IR + gate library (replaces qiskit's role)
  models/    — benchmark circuit zoo (replaces benchmarks/qcg)
  cutter/    — optimal joint wire+gate cut search (first-party branch&bound
               solver replacing z3) + circuit rewrite into fragments
  virt/      — QPD virtual-gate tables and fragment/variant bookkeeping
  ops/       — exact batched statevector engine, knitting contraction,
               sampling, noise channels (replaces qiskit-aer)
  parallel/  — device-mesh sharding of variant and amplitude axes
  compiler/  — heuristic partitioning passes (replaces the vendored qvm
               compiler's clingo/ASP models)
  utils/     — logging, config, artifacts
"""

__version__ = "0.1.0"
