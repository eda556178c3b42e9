"""Fidelity / evaluation harness.

Analog of the reference Utilities (src/HwAwareCutter/Utilities.py): runs the
uncut circuit and the cut+knitted circuit on ideal and/or noisy backends and
computes the three Hellinger fidelities.  Thread-pair latency overlap in the
reference (Utilities.py:51-67) is unnecessary here — everything is batched
on one device.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .circuit.circuit import Circuit
from .ops.statevector import Distribution, simulate_circuit
from .run import run_virtual_circuit
from .utils.logger import get_logger
from .virt.virtual_circuit import VirtualCircuit


def hellinger_fidelity(p: Distribution | dict, q: Distribution | dict) -> float:
    """(sum_i sqrt(p_i q_i))^2 over the union support, matching qiskit's
    hellinger_fidelity used at Utilities.py:222-224.  Like qiskit, both
    inputs are normalised first (a finite-shot knit can sum to 1 +- eps;
    without normalisation the fidelity could exceed 1).

    Negative entries of an *unprojected* quasi-distribution are excluded
    from both the overlap and the normalising mass (qiskit only ever sees
    non-negative counts, so this case has no reference analog).  Because
    the positive mass of a quasi-distribution with negativity exceeds its
    total, the score is deflated relative to projecting first — callers
    scoring unprojected knits (``project=False``) should project onto the
    simplex (``ops.knit.nearest_probability_distribution``) before
    scoring if they want the reference-comparable number."""
    pd = p.to_dict() if isinstance(p, Distribution) else dict(p)
    qd = q.to_dict() if isinstance(q, Distribution) else dict(q)
    p_sum = sum(v for v in pd.values() if v > 0)
    q_sum = sum(v for v in qd.values() if v > 0)
    if p_sum <= 0 or q_sum <= 0:
        return 0.0
    total = 0.0
    for key, pv in pd.items():
        qv = qd.get(key, 0.0)
        if pv > 0 and qv > 0:
            total += math.sqrt(pv * qv)
    return (total * total) / (p_sum * q_sum)


@dataclass
class ComparisonResult:
    input_fidelity: float       # uncut: ideal vs noisy
    cut_fidelity: float         # cut+knit: ideal vs noisy
    cut_vs_uncut_fidelity: float  # the self-consistency oracle (~1.0)


def compare_original_with_cut(
    original: Circuit,
    cut: Circuit,
    noise_model=None,
    shots: int | None = None,
    seed: int = 0,
) -> ComparisonResult:
    """Reference: compareOriginalCircWithCutCirc (Utilities.py:154-226).

    .. warning:: **Semantics differ from the reference when
       ``noise_model=None``.** The reference ALWAYS runs the noisy legs on
       a fake backend, so its ``input_fidelity``/``cut_fidelity`` are
       ideal-vs-noisy numbers (e.g. ghz-24 orig 0.731).  Here, with
       ``noise_model=None`` the noisy legs reuse the ideal results and
       both fidelities are trivially 1.0 — only ``cut_vs_uncut_fidelity``
       (the headline self-consistency metric, noise-free in both
       frameworks) is comparable.  Pass a ``NoiseModel``
       (e.g. ``ops.noise.fake_kolkata_v2()``) to reproduce the
       reference's noisy table.  See MIGRATION.md.
    """
    log = get_logger(__name__)
    input_ideal = simulate_circuit(original)
    if shots is not None:
        # the reference's "ideal" legs are themselves 1000-shot Aer runs
        # (Utilities.py:49-51), so sample the uncut oracle too
        from .ops.sampling import sample_distribution

        input_ideal = sample_distribution(input_ideal, shots, seed + 101)
    virt = VirtualCircuit(cut)
    cut_ideal, _ = run_virtual_circuit(virt, shots=shots, seed=seed)

    if noise_model is not None:
        from .ops.noise import simulate_noisy_circuit, run_noisy_virtual_circuit

        # distinct seeds: the reference's noisy legs are independent
        # backend jobs, so their shot draws never coincide with the
        # ideal legs' (an untranspiled model would otherwise reproduce
        # the ideal leg bit-for-bit and report exactly 1.0)
        input_noisy = simulate_noisy_circuit(
            original, noise_model, shots=shots, seed=seed + 211
        )
        cut_noisy, _ = run_noisy_virtual_circuit(
            virt, noise_model, shots=shots, seed=seed + 223
        )
    else:
        input_noisy = input_ideal
        cut_noisy = cut_ideal

    res = ComparisonResult(
        hellinger_fidelity(input_ideal, input_noisy),
        hellinger_fidelity(cut_ideal, cut_noisy),
        hellinger_fidelity(input_ideal, cut_ideal),
    )
    log.info(f"inputCircFidelity: {res.input_fidelity}")
    log.info(f"cutCircFidelity: {res.cut_fidelity}")
    log.info(f"cutVsUncutFidelity: {res.cut_vs_uncut_fidelity}")
    return res


def compare_original_with_cut_multiple_backends(
    original: Circuit,
    cut: Circuit,
    backends: list,
    reference_backend=None,
    shots: int | None = 1000,
    seed: int = 0,
) -> ComparisonResult:
    """Heterogeneous-hardware comparison: fragment i runs on ``backends[i]``
    (NoiseModel), the uncut circuit on ``reference_backend``.

    Reference: compareOriginalCircWithCutCircMultipleBackends
    (Utilities.py:230-297), including the fragment-fits-backend capacity
    assertion (Utilities.py:123).
    """
    from .ops.noise import (
        default_noise_model,
        run_noisy_virtual_circuit,
        simulate_noisy_circuit,
    )

    log = get_logger(__name__)
    if reference_backend is None:
        reference_backend = default_noise_model()

    # seed hygiene mirrors compare_original_with_cut: the reference's
    # legs are independent backend jobs, so shot draws must not coincide
    # (same-seed ideal/noisy legs of an untranspiled model would
    # reproduce each other bit-for-bit and report exactly 1.0); the
    # ideal input leg is shot-sampled like the reference's nShots run
    input_ideal = simulate_circuit(original)
    if shots is not None:
        from .ops.sampling import sample_distribution

        input_ideal = sample_distribution(input_ideal, shots, seed + 101)
    input_noisy = simulate_noisy_circuit(
        original, reference_backend, shots=shots, seed=seed + 211
    )
    cut_ideal, _ = run_virtual_circuit(
        VirtualCircuit(cut.copy()), shots=shots, seed=seed
    )
    cut_noisy, _ = run_noisy_virtual_circuit(
        VirtualCircuit(cut.copy()), list(backends), shots=shots,
        seed=seed + 223,
    )

    res = ComparisonResult(
        hellinger_fidelity(input_ideal, input_noisy),
        hellinger_fidelity(cut_ideal, cut_noisy),
        hellinger_fidelity(input_ideal, cut_ideal),
    )
    log.info(f"inputCircFidelity: {res.input_fidelity}")
    log.info(f"cutCircFidelity: {res.cut_fidelity}")
    log.info(f"cutVsUncutFidelity: {res.cut_vs_uncut_fidelity}")
    return res
