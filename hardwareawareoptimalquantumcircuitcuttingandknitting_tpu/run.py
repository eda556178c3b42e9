"""Execution runtime: run all fragments and knit.

Analog of the reference's ``run_virtual_circuit`` (qvm/run.py:23-71), with
the Aer job fan-out replaced by the batched variant engine and the Pool(8)
dict knit replaced by the einsum contraction.  ``shots=None`` selects the
exact path (probability tensors); an integer emulates the reference's
shot-sampled estimate.
"""
from __future__ import annotations

import time
from dataclasses import dataclass

from .ops.knit import knit, nearest_probability_distribution
from .ops.statevector import Distribution
from .ops.variant_engine import run_all_fragments
from .utils.logger import get_logger
from .virt.virtual_circuit import VirtualCircuit

# "auto" switches to the constant-memory streamed scan above this many
# GLOBAL labels (product over all vgates): the batched path materialises
# every fragment's [V, 2^k] block and aligns it to the global label order
# in the knit — fine at ghz/sup-20 scale, but sup-25 (20736) and aqft-16
# (24576) class fan-outs belong on the scan (BENCH_TABLE.md guidance,
# promoted to a default).
AUTO_STREAM_LABELS = 16384


def _run_fragments(
    virt: VirtualCircuit, chunk_size: int, engine: str,
    mesh=None, max_local_qubits=None, dtype=None,
):
    # "auto" takes the XLA path: Mosaic kernel compiles through the
    # tunneled TPU backend are minutes-slow and high-variance (measured:
    # 17 s for small lane counts, unbounded at sup-20/25 scale), so the
    # Pallas engine is strictly opt-in (engine="pallas").
    if engine in ("xla", "auto", "pallas") and dtype is not None:
        import jax.numpy as jnp

        if dtype != jnp.float32:
            raise ValueError(
                "dtype= (bf16 serving) is supported by the streamed, "
                f"sharded and sampled engines, not engine={engine!r}"
            )
    if engine in ("xla", "auto"):
        return run_all_fragments(virt, chunk_size)
    assert engine == "sharded", engine
    from .ops.sharded_fragment import run_all_fragments_sharded

    return run_all_fragments_sharded(
        virt, max_local_qubits=max_local_qubits, mesh=mesh,
        dtype=dtype,
    )


@dataclass
class RunTimeInfo:
    """Phase timings (reference: qvm/run.py:17-20, extended)."""

    run_time: float
    knit_time: float


def run_virtual_circuit(
    virt: VirtualCircuit,
    shots: int | None = None,
    chunk_size: int = 1024,
    seed: int = 0,
    project: bool = True,
    engine: str = "auto",
    tracer=None,
    checkpoint_dir=None,
    mesh=None,
    max_local_qubits: int | None = None,
    dtype=None,
    trunc_eps: float = 0.0,
    head_labels: int = 0,
    sample_method: str = "iid",
    sample_eps: float | None = None,
    sample_cv: bool = False,
    sample_pallas: bool = False,
    keep_clbits=None,
    teleport: str = "qpd",
) -> tuple[Distribution, RunTimeInfo]:
    """``engine``: "auto" (batched unrolled programs, switching to the
    streamed scan above ``AUTO_STREAM_LABELS`` global labels), "xla"
    (batched unrolled, always), "streamed" (constant-memory lax.scan over
    global label chunks; use for large fan-outs), "sharded" (variant x
    amplitude co-sharding over a ``(dp, amp)`` device mesh — fragments
    larger than one device's budget; see ops/sharded_fragment.py),
    "sampled" (Monte-Carlo QPD sampling, ops/qpd_sampling.py — ``shots``
    is the label-sample budget; unbiased with std ~ gamma/sqrt(shots),
    for cut counts whose label grid is too large to enumerate), or
    "pallas" (the streamed scan with each eligible fragment's per-chunk
    sim replaced by the whole-variant-in-VMEM Mosaic kernel,
    ops/pallas_variant.py — measured 1.7x on sup-20's fan-out.  Strictly
    opt-in: Mosaic compiles through the tunneled TPU backend are
    minutes-slow, amortised into the one-time deploy).

    ``mesh`` (engine="sampled"): a jax Mesh with a "dp" axis — the
    sampled-label scan shards its block axis over dp (each device scans
    its own label blocks, the knit carries psum over ICI).

    ``mesh`` (engine="sharded"): a jax Mesh with axes ("dp", "amp"); with
    ``mesh=None`` each fragment gets its own split sized so no device
    holds more than ``2^max_local_qubits`` amplitudes.

    ``tracer``: optional utils.profiling.Tracer — records phase timings
    and (if its profile_dir is set) wraps the device work in a
    jax.profiler trace.

    ``checkpoint_dir``: optional directory; fragment variant results are
    saved there after simulation and, when present, loaded instead of
    re-simulating (resume/knit-only reruns).

    ``engine="streamed"`` runs the constant-memory lax.scan path
    (ops/streamed.py) — sim and knit fuse into one program, so the two
    RunTimeInfo phases collapse into run_time.  ``shots`` samples the
    knitted marginal; ``checkpoint_dir`` checkpoints the scan carry per
    segment (resume mid-scan); noisy execution goes through
    ``ops.noise.run_noisy_virtual_circuit(engine="streamed")``.

    ``head_labels`` (engine="sampled"): stratified estimator — the
    heaviest labels are enumerated exactly and the whole sample budget
    goes to the tail; stderr scale drops from gamma_total to gamma_tail
    (ops/qpd_sampling.stratified_split).  No-op on uniform cut sets.

    ``sample_method`` (engine="sampled"): "iid" (default) or "lhs" —
    balanced (Latin-hypercube) label sampling pins each cut's empirical
    variant counts to their expectation, killing the per-cut main-effect
    variance at no extra cost (ops/qpd_sampling.sample_labels).

    ``sample_cv`` (engine="sampled"): control-variate estimator — regress
    each outcome against the per-sample signed total mass, whose exact
    expectation (1, trace preservation) is known a priori
    (ops/qpd_sampling._cv_adjust; CV4Quantum role, arXiv:2502.08735).
    Zero extra simulation; cancels the shared sign-product noise, the
    dominant variance on coherent plans.  Composes with every other
    sampled-engine knob.

    ``sample_pallas`` (engine="sampled"): route collapse-mode fragments
    through the whole-variant-in-VMEM Mosaic kernel
    (ops/pallas_variant.make_collapse_chunk_kernel — the mid-circuit
    collapse executes in-kernel on the resident state); fragments
    outside the kernel's width gate fall back to the XLA builder.
    Strictly opt-in, like engine="pallas".

    ``sample_eps`` (engine="sampled"): eps-targeted accuracy dial — grow
    the sample budget adaptively until the worst per-outcome EMPIRICAL
    standard error is <= sample_eps, instead of trusting the worst-case
    Hoeffding budget (usually far fewer samples: signs cancel on real
    plans).  ``shots`` then acts as the budget CAP (default 2M).
    Composes with ``head_labels``/``sample_method``
    (ops/qpd_sampling.sampled_knit_adaptive).

    ``keep_clbits`` (any engine): marginal knit — return the
    distribution over just this clbit set, summing the rest out inside
    the knit (streamed: inside the scan body, so the full 2^n vector
    never exists anywhere — the 30+ qubit mode, ops/streamed.py).
    ``shots`` then samples the marginal.  The returned Distribution's
    ``bit_positions`` are the kept clbits.

    ``trunc_eps`` (engine="streamed"): certified approximate knitting —
    drop the lowest-|coefficient-product| labels while their summed L1
    bound stays <= trunc_eps (arXiv:2212.01270 role; pays off on
    rzz/cp cuts whose cos/sin products are sharply skewed).

    ``dtype`` (engine="streamed"/"sharded"/"sampled"): ``jnp.bfloat16``
    selects the
    quantized serving mode — statevector passes and ancestor banks at
    half the HBM bytes (measured 2.3x on the sup-25 serving step,
    bf16_ab_probe.json) with ~2^-8-per-pass rounding; pair with
    ``shots`` where sampling noise dominates.  Exact-parity work stays
    on the f32 default.

    ``teleport``: "qpd" (default — reference parity: teleport-flagged
    cuts execute through the QPD route, Cutter.py:574 FIXME) or
    "execute" — expand teleport cuts into the real EPR-gadget protocol
    (virt/teleport.py): teleport-connected fragments merge (the
    simulator stands in for the quantum channel) and the cuts cost NO
    sampling overhead, exactly as the plan's S metric promises.
    """
    from .utils.profiling import Tracer

    if engine not in (
        "auto", "xla", "streamed", "pallas", "sharded", "sampled"
    ):
        raise ValueError(f"unknown engine {engine!r}")
    if teleport not in ("qpd", "execute"):
        raise ValueError(f"unknown teleport mode {teleport!r}")
    if teleport == "execute":
        from .virt.teleport import expand_teleport_cuts, has_teleport_cuts

        if has_teleport_cuts(virt._circuit):
            virt = VirtualCircuit(expand_teleport_cuts(virt._circuit))
    log = get_logger(__name__)
    tracer = tracer or Tracer()
    if trunc_eps and engine not in ("auto", "streamed"):
        raise ValueError(
            "trunc_eps (certified truncation) is a streamed-engine "
            f"feature, not engine={engine!r}"
        )
    if head_labels and engine != "sampled":
        raise ValueError(
            "head_labels (stratified estimation) is a sampled-engine "
            f"feature, not engine={engine!r}"
        )
    if sample_method != "iid" and engine != "sampled":
        raise ValueError(
            "sample_method (QPD label sampling) is a sampled-engine "
            f"feature, not engine={engine!r}"
        )
    if sample_eps is not None and engine != "sampled":
        raise ValueError(
            "sample_eps (eps-targeted sampling) is a sampled-engine "
            f"feature, not engine={engine!r}"
        )
    if sample_pallas and engine != "sampled":
        raise ValueError(
            "sample_pallas (collapse-mode VMEM kernel rows) is a "
            "sampled-engine knob; for the exact engines use "
            "engine='pallas'"
        )
    if sample_cv and engine != "sampled":
        raise ValueError(
            "sample_cv (control-variate estimation) is a sampled-engine "
            f"feature, not engine={engine!r}"
        )
    if engine == "sampled":
        # Monte-Carlo QPD sampling: only the sampled labels' instances
        # run (ops/qpd_sampling.py).  ``shots`` is the QPD sample budget
        # (default: the plan's kappa / 0.05^2 Hoeffding budget).
        from .ops.qpd_sampling import sampled_knit, sampling_overhead

        if sample_eps is not None:
            from .ops.qpd_sampling import sampled_knit_adaptive

            now = time.perf_counter()
            cap = shots if shots is not None else 2_000_000
            with tracer.phase("qpd_sample_knit_adaptive", eps=sample_eps):
                dist, _, used = sampled_knit_adaptive(
                    virt, sample_eps, seed=seed, dtype=dtype,
                    head_labels=head_labels, method=sample_method,
                    keep_clbits=keep_clbits, max_samples=cap,
                    control_variate=sample_cv,
                    pallas_variant=sample_pallas, mesh=mesh,
                )
                log.info(
                    f"sampled engine: eps={sample_eps:g} met with "
                    f"{used} samples (cap {cap})"
                )
                if project:
                    dist = nearest_probability_distribution(dist)
            return dist, RunTimeInfo(time.perf_counter() - now, 0.0)

        budget = shots
        if budget is None:
            over = sampling_overhead(virt, eps=0.05)
            # the Hoeffding budget kappa/eps^2 grows as 9^n_cuts — cap the
            # default and report the accuracy actually bought; callers
            # wanting tighter eps pass ``shots`` explicitly
            budget = min(over["shots_for_eps"], 2_000_000)
            if budget < over["shots_for_eps"]:
                log.warning(
                    f"sampled engine: default budget capped at {budget} "
                    f"(kappa={over['kappa']:.3g} wants "
                    f"{over['shots_for_eps']} for eps=0.05; the cap buys "
                    f"eps~{(over['kappa'] / budget) ** 0.5:.3g}); pass "
                    "shots= for a larger budget"
                )
        now = time.perf_counter()
        with tracer.phase("qpd_sample_knit", samples=budget):
            dist = sampled_knit(virt, budget, seed=seed, dtype=dtype,
                                head_labels=head_labels,
                                method=sample_method,
                                keep_clbits=keep_clbits,
                                control_variate=sample_cv,
                                pallas_variant=sample_pallas,
                                mesh=mesh)
            if project:
                dist = nearest_probability_distribution(dist)
        return dist, RunTimeInfo(time.perf_counter() - now, 0.0)
    if engine == "auto":
        import jax.numpy as jnp

        labels = 1
        for vg in virt.vgates:
            labels *= vg.spec.num_instantiations
        if trunc_eps or (dtype is not None and dtype != jnp.float32):
            # bf16 serving / certified truncation are streamed
            # capabilities — route unconditionally so the same call
            # works at any size
            log.info("auto engine: dtype/trunc_eps -> streamed scan")
            engine = "streamed"
        elif labels > AUTO_STREAM_LABELS:
            log.info(
                f"auto engine: {labels} global labels > "
                f"{AUTO_STREAM_LABELS} -> streamed scan"
            )
            engine = "streamed"
    if engine in ("streamed", "pallas"):
        # engine="pallas" (r4): the streamed scan with each eligible
        # fragment's per-chunk sim replaced by the whole-variant-in-VMEM
        # Mosaic kernel (ops/pallas_variant.py; measured 1.7x on sup-20's
        # fan-out, pallas_variant_probe.json).  Still strictly opt-in:
        # Mosaic compiles through the tunneled backend are minutes-slow
        # (deploy-once).  Ineligible fragments (width outside [8, 19],
        # noisy, bf16) keep the XLA sim inside the same scan.
        from .ops.streamed import run_virtual_circuit_streamed

        now = time.perf_counter()
        with tracer.phase(
            "stream_sim_knit", instances=virt.total_instantiations(),
            chunk=chunk_size,
        ):
            dist = run_virtual_circuit_streamed(
                virt, chunk=chunk_size, project=project,
                shots=shots, seed=seed, checkpoint_dir=checkpoint_dir,
                dtype=dtype, trunc_eps=trunc_eps, keep_clbits=keep_clbits,
                pallas_variant=engine == "pallas",
            )
        return dist, RunTimeInfo(time.perf_counter() - now, 0.0)
    frag_sizes = tuple(p.num_data_qubits for p in virt.programs.values())
    log.info(
        f"Running virtualizer with {len(virt.fragments)} {frag_sizes} "
        f"fragments and {len(virt.vgates)} vgates..."
    )
    log.info(f"Running {virt.total_instantiations()} instances...")

    now = time.perf_counter()
    resumed = False
    if checkpoint_dir is not None:
        from .utils.checkpoint import (
            checkpoint_fingerprint,
            has_checkpoint,
            load_fragment_results,
        )

        if has_checkpoint(checkpoint_dir):
            with tracer.phase("load_checkpoint"):
                results = load_fragment_results(
                    checkpoint_dir,
                    expect_fingerprint=checkpoint_fingerprint(
                        virt, dtype=dtype
                    ),
                )
            if results is None:
                log.warning(
                    f"Checkpoint at {checkpoint_dir} belongs to a different "
                    "circuit/cut plan; re-simulating."
                )
            else:
                resumed = True
                log.info(f"Resumed fragment results from {checkpoint_dir}.")

    try:
        if not resumed:
            tracer.start_device_trace()
            with tracer.phase(
                "simulate", instances=virt.total_instantiations(),
                engine=engine,
            ):
                results = _run_fragments(
                    virt, chunk_size, engine,
                    mesh=mesh, max_local_qubits=max_local_qubits,
                    dtype=dtype,
                )
            if checkpoint_dir is not None:
                from .utils.checkpoint import (
                    checkpoint_fingerprint,
                    save_fragment_results,
                )

                with tracer.phase("save_checkpoint"):
                    save_fragment_results(
                        results, checkpoint_dir,
                        fingerprint=checkpoint_fingerprint(
                            virt, dtype=dtype
                        ),
                    )

        if shots is not None:
            from .ops.sampling import sample_fragment_results

            with tracer.phase("sample", shots=shots):
                results = sample_fragment_results(results, shots, seed)
        run_time = time.perf_counter() - now

        log.info("Knitting...")
        now = time.perf_counter()
        with tracer.phase("knit"):
            dist = knit(virt, results, keep_clbits=keep_clbits)
        knit_time = time.perf_counter() - now
    finally:
        tracer.stop_device_trace()
    log.info(f"Knitted in {knit_time:.2f}s.")

    if project:
        with tracer.phase("project"):
            dist = nearest_probability_distribution(dist)
    return dist, RunTimeInfo(run_time, knit_time)
