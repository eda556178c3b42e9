"""Monte-Carlo QPD sampling: estimate the knit without enumerating labels.

The reference enumerates every global label exhaustively — all
``prod_g n_g`` instantiations are executed and knitted
(qvm/virtual_circuit.py:133-137, run.py:36-42).  That is optimal for few
cuts but scales exponentially in the cut count.  This module implements
the standard quasi-probability sampling estimator on top of the same
engines:

  * each cut's coefficient table ``coef[v, b]`` factors into a sampling
    magnitude ``m[v] = max_b |coef[v, b]|`` and a bounded fold ratio
    ``coef[v, b] / m[v]`` (a pure sign for the fixed-gate QPDs, a value
    in [-1, 1] for the parameterised rzz/cp tables),
  * ``gamma_g = sum_v m[v]`` is the cut's 1-norm; sampling labels with
    ``P(v_g) = m_g[v_g] / gamma_g`` independently per cut and weighting
    each sample by ``prod_g gamma_g`` times the signs gives an unbiased
    estimator of the knitted distribution,
  * the estimator variance scales with ``kappa = (prod_g gamma_g)^2`` —
    the well-known sampling overhead (the cutter's S objective is exactly
    ``prod`` per-cut overhead; see cutter/solver.py:15).

TPU shape: sampled labels are deduplicated on host, each unique label's
fragment rows are simulated in one vmapped batch (slot tables gathered by
the label's per-vgate variant indices — no flat-index materialisation),
and the cross-fragment combination is a single weighted einsum over the
label axis (an MXU contraction), mirroring ops/knit.knit_values' layout.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..virt.virtual_circuit import VirtualCircuit
from .bits import permute_bits_flat
from .knit import fold_weights
from .statevector import Distribution
from .variant_engine import _slot_tables, make_sim_fn


def _variant_magnitudes(spec) -> np.ndarray:
    """Per-variant sampling magnitude ``m[v] = max_b |coef[v, b]|``.

    For the fixed-gate QPDs (cx/cy/cz, wire move) the magnitude is
    outcome-independent and this is just ``|coef[v, 0]|`` (the textbook
    gammas: 3 and 4); parameterised QPDs (rzz/cp) have outcome-dependent
    coefficients, for which sampling by the max and folding
    ``coef[v, b] / m[v]`` (a ratio in [-1, 1]) keeps the estimator
    unbiased with gamma = sum_v m[v]."""
    coef = np.asarray(spec.coef, np.float64)
    return np.maximum(np.abs(coef[:, 0]), np.abs(coef[:, 1]))


def cut_gammas(virt: VirtualCircuit) -> list[float]:
    """Per-vgate QPD 1-norms ``gamma_g = sum_v max_b |coef[v, b]|``."""
    return [
        float(_variant_magnitudes(vg.spec).sum()) for vg in virt.vgates
    ]


def sampling_overhead(virt: VirtualCircuit, eps: float | None = None):
    """``{"gammas", "gamma_total", "kappa", "shots_for_eps"}`` — the
    analytic sampling budget of this cut plan.  ``kappa = gamma_total^2``
    bounds the estimator variance per outcome; ``ceil(kappa / eps^2)``
    samples suffice for additive error ``eps`` (Hoeffding scale).  The
    cut search already minimises exactly this product (the S objective,
    cutter/solver.py:15 / reference Cutter.py:567-571)."""
    gammas = cut_gammas(virt)
    gamma_total = float(np.prod(gammas)) if gammas else 1.0
    out = {
        "gammas": gammas,
        "gamma_total": gamma_total,
        "kappa": gamma_total * gamma_total,
    }
    if eps is not None:
        out["shots_for_eps"] = int(np.ceil(out["kappa"] / (eps * eps)))
    return out


def _systematic_column(p: np.ndarray, n: int, rng) -> np.ndarray:
    """``n`` variant ids whose counts are the systematic-resampling
    allocation of ``n * p`` (each count is floor or ceil of ``n * p[v]``,
    exact in expectation over the uniform offset), independently
    permuted.  After the permutation every single row is marginally
    distributed exactly as ``p`` — the building block of the balanced
    (Latin-hypercube) label sampler."""
    edges = np.cumsum(p)
    edges[-1] = 1.0  # guard fp drift so searchsorted stays in range
    pos = (np.arange(n) + rng.random()) / n
    ids = np.searchsorted(edges, pos, side="right").astype(np.int32)
    return rng.permutation(ids)


def sample_labels(
    virt: VirtualCircuit, num_samples: int, seed: int = 0,
    method: str = "iid",
) -> np.ndarray:
    """[num_samples, n_vgates] int32 variant indices, drawn independently
    per cut with ``P(v) = max_b |coef[v, b]| / gamma``.

    ``method="lhs"``: balanced (Latin-hypercube) sampling — each cut's
    column is a systematic-resampling allocation of its variant
    distribution, independently permuted.  Rows stay exchangeable with
    the exact per-row marginal (the estimator remains unbiased), but
    each cut's EMPIRICAL variant counts are pinned to within 1 of
    ``n * p`` — the per-cut main-effect component of the estimator
    variance vanishes (O(gamma/n) instead of O(gamma/sqrt(n)) on
    single-cut plans; classic LHS variance decomposition)."""
    if method not in ("iid", "lhs"):
        raise ValueError(f"unknown sampling method {method!r}")
    rng = np.random.default_rng(seed)
    cols = []
    for vg in virt.vgates:
        m = _variant_magnitudes(vg.spec)
        p = m / m.sum()
        if method == "lhs":
            cols.append(_systematic_column(p, num_samples, rng))
        else:
            cols.append(
                rng.choice(len(m), size=num_samples, p=p).astype(np.int32)
            )
    if not cols:
        return np.zeros((num_samples, 0), np.int32)
    return np.stack(cols, axis=1)


def sample_label_counts(
    virt: VirtualCircuit,
    num_samples: int,
    seed: int = 0,
    chunk: int = 1 << 20,
    accept=None,
    max_draws: int = 1 << 27,
    method: str = "iid",
) -> tuple[np.ndarray, np.ndarray]:
    """(unique_labels [L, G], counts [L]) for ``num_samples`` accepted
    draws, accumulated chunk-by-chunk — peak memory is O(chunk + unique),
    not O(num_samples), so budgets far beyond the unique-label count cost
    nothing extra.

    ``accept``: optional vectorised predicate ``[n, G] -> bool mask``
    (rejection sampling — the stratified tail).  ``max_draws`` bounds the
    total draws so a vanishing acceptance rate fails loudly instead of
    hanging.

    ``method="lhs"`` balances each cut's variant counts per chunk (see
    :func:`sample_labels`); rows stay exchangeable, so rejection
    filtering and truncation to the remaining budget keep the accepted
    rows marginally distributed as the (conditional) target."""
    # Dedup via a BIG-ENDIAN mixed-radix int64 packing of each row when
    # the label grid fits in 63 bits: np.unique on int64 keys sorts in
    # the same lexicographic order as the tuple-dict path it replaces
    # (identical output ordering -> identical downstream collapse draws)
    # but ~50x faster than np.unique(axis=0)'s void-dtype memcmp sort —
    # the host-side sampler was 1.3 s of qft-16's 7.8 s steady estimate.
    radices = [
        max(1, len(_variant_magnitudes(vg.spec))) for vg in virt.vgates
    ]
    grid = 1
    for r in radices:
        grid *= r
    strides = None
    if 0 < grid <= (1 << 62) and radices:
        strides = np.empty(len(radices), np.int64)
        s = 1
        for g in range(len(radices) - 1, -1, -1):
            strides[g] = s
            s *= radices[g]
    packed_parts: list[np.ndarray] = []
    count_parts: list[np.ndarray] = []
    acc: dict[tuple, int] = {}
    rng_seed = seed
    done = 0
    drawn = 0
    while done < num_samples:
        # the 1024 floor amortises rejection-sampling misses; without a
        # predicate draw exactly the remainder (keeps LHS balance whole)
        want = num_samples - done
        take = min(chunk, want if accept is None else max(1024, want))
        if drawn + take > max_draws:
            raise ValueError(
                f"rejection sampling exceeded {max_draws} draws with "
                f"{done}/{num_samples} accepted — the acceptance rate is "
                "too small for this budget (shrink head_labels or the "
                "sample budget: a tiny gamma_tail needs few samples)"
            )
        labels = sample_labels(virt, take, seed=rng_seed, method=method)
        rng_seed += 1  # fresh stream per chunk
        drawn += take
        if accept is not None:
            labels = labels[accept(labels)]
            if len(labels) == 0:
                continue
        labels = labels[: num_samples - done]
        if strides is not None:
            pk, ct = np.unique(
                labels.astype(np.int64) @ strides, return_counts=True
            )
            packed_parts.append(pk)
            count_parts.append(ct.astype(np.int64))
        else:
            uniq, counts = np.unique(labels, axis=0, return_counts=True)
            for row, c in zip(uniq, counts):
                key = tuple(int(v) for v in row)
                acc[key] = acc.get(key, 0) + int(c)
        done += len(labels)
    G = len(virt.vgates)
    if strides is not None:
        if not packed_parts:
            return np.zeros((0, G), np.int32), np.zeros(0, np.int64)
        allp = np.concatenate(packed_parts)
        allc = np.concatenate(count_parts)
        uniq_p, inv = np.unique(allp, return_inverse=True)
        counts = np.zeros(len(uniq_p), np.int64)
        np.add.at(counts, inv, allc)
        uniq = np.empty((len(uniq_p), G), np.int32)
        rem = uniq_p
        for g in range(G - 1, -1, -1):
            uniq[:, g] = (rem % radices[g]).astype(np.int32)
            rem = rem // radices[g]
        return uniq, counts
    if not acc:
        return np.zeros((0, G), np.int32), np.zeros(0, np.int64)
    uniq = np.array(sorted(acc), np.int32).reshape(len(acc), G)
    counts = np.array([acc[tuple(int(v) for v in r)] for r in uniq],
                      np.int64)
    return uniq, counts


def stratified_split(virt: VirtualCircuit, head_labels: int):
    """Split the label grid for the stratified estimator: the up-to-
    ``head_labels`` heaviest labels (by sampling-magnitude product
    ``prod_g m_g(v_g)``) are enumerated EXACTLY; only the tail is
    sampled, from its conditional distribution with 1-norm
    ``gamma_tail`` — the estimator variance drops from ``gamma_total^2``
    to ``gamma_tail^2`` (control-variate/stratification role of
    CV4Quantum, arXiv:2502.08735, PAPERS.md; skewed rzz/cp products make
    gamma_tail << gamma_total).

    Head membership is purely weight-based (``w > threshold``, ties
    excluded) so a sampled label's side is decidable from its own
    weight.  Returns ``None`` when no strict-majority head exists
    (uniform cuts: every weight equal), head_labels <= 0, or the flat
    grid exceeds host memory (total > 2^22 — exactly the regime the
    plain estimator serves; a warning is logged); else
    ``(head_rows [H, G] int32, head_mass [H], threshold, gamma_head,
    gamma_tail)``."""
    from ..utils.logger import get_logger
    from .variant_engine import label_strides, label_weight_bounds

    specs = [vg.spec for vg in virt.vgates]
    if head_labels <= 0 or not specs:
        return None
    gstride, n_inst, total = label_strides(specs, range(len(specs)))
    if total > (1 << 22):
        get_logger(__name__).warning(
            f"stratified head disabled: the flat label grid "
            f"({total} labels) exceeds 2^22; using the plain estimator"
        )
        return None
    w = label_weight_bounds(specs, gstride, n_inst, total)
    ws = np.sort(w)[::-1]
    # threshold at the (head_labels+1)-th largest weight so the head
    # holds UP TO head_labels entries (strictly-greater keeps membership
    # decidable from a sample's own weight; ties at the threshold go to
    # the tail).  head_labels >= total admits the whole grid.
    t = float(ws[head_labels]) if head_labels < total else -1.0
    head_ids = np.nonzero(w > t)[0]
    if len(head_ids) == 0:
        return None
    gamma_head = float(w[head_ids].sum())
    gamma_tail = float(w.sum() - gamma_head)
    rows = np.stack([
        ((head_ids // gstride[g]) % n_inst[g]).astype(np.int32)
        for g in range(len(specs))
    ], axis=1)
    return rows, w[head_ids], t, gamma_head, gamma_tail


def _sample_tail_counts(
    virt: VirtualCircuit, num_samples: int, threshold: float,
    seed: int = 0, method: str = "iid",
) -> tuple[np.ndarray, np.ndarray]:
    """(unique tail labels [L, G], counts [L]): rejection-sample the
    product distribution, keeping draws whose magnitude product is
    <= threshold (the tail side of :func:`stratified_split`) until
    ``num_samples`` are accepted.  Acceptance rate is
    gamma_tail / gamma_total, so drawing cost stays
    gamma_tail * gamma_total / eps^2 — below the plain estimator's
    gamma_total^2 / eps^2 whenever a head exists (draws are capped by
    sample_label_counts' max_draws, which fails loudly)."""
    mags = [_variant_magnitudes(vg.spec) for vg in virt.vgates]

    def accept(labels):
        w = np.ones(len(labels), np.float64)
        for g, m in enumerate(mags):
            w *= m[labels[:, g]]
        return w <= threshold

    return sample_label_counts(virt, num_samples, seed, accept=accept,
                               method=method)


def _sign_weights(virt: VirtualCircuit, frag_name: str) -> list[np.ndarray]:
    """fold_weights with each owner-side coefficient normalised by its
    variant's sampling magnitude ``max_b |coef[v, b]|`` (the same ``m``
    :func:`sample_labels` draws with — the two MUST share the convention
    for unbiasedness).  Non-owner rows are ones (max 1, no-op).
    Zero-magnitude variants are never sampled; guard the division."""
    out = []
    for w in fold_weights(virt, frag_name):
        w = np.asarray(w, np.float64)
        mag = np.maximum(np.abs(w[:, 0]), np.abs(w[:, 1]))
        out.append(w / np.where(mag > 0, mag, 1.0)[:, None])
    return out


def _fold_rows_per_label(virt, frag_name, rows, lab, positions):
    """Contract a fragment's vgate clbits out of per-label rows.

    ``rows``: [L, 2^k] per-unique-label outcome rows; ``lab``: [L, G]
    global label matrix; ``positions``: ascending global clbit ids (bit j
    of the row index carries positions[j]).  Returns ([L, 2^d], data
    positions) with each touching vgate's measure clbit contracted by its
    per-label sign weight (owner) or summed out (other endpoint).

    PARITY-CRITICAL twin of ops/knit._fold_fragment (label axis instead
    of variant-grid axes): the owner-side rule, the structurally-zero
    clbit branch, and the bit-split convention must stay in lockstep —
    any change to the exact fold must be mirrored here (the full-grid
    identity tests in tests/test_qpd_sampling.py catch drift).
    """
    prog = virt.programs[frag_name]
    touching = list(prog.touching)
    weights = _sign_weights(virt, frag_name)
    positions = list(positions)
    k = len(positions)
    t = rows
    L = t.shape[0]
    for ti, g in enumerate(touching):
        w = jnp.asarray(weights[ti], t.dtype)  # [n_inst, 2]
        wl = w[lab[:, g]]                      # [L, 2] per-label weights
        cg = virt.num_clbits + g
        if cg in positions:
            j = positions.index(cg)
            high, low = 1 << (k - 1 - j), 1 << j
            t = t.reshape(L, high, 2, low)
            t = (
                t[:, :, 0, :] * wl[:, 0, None, None]
                + t[:, :, 1, :] * wl[:, 1, None, None]
            )
            positions.pop(j)
            k -= 1
            t = t.reshape(L, 1 << k)
        else:
            # clbit structurally zero in this fragment (knit.py:98-103)
            t = t * wl[:, 0, None]
    return t, positions


def _marginalize_rows(t, positions, keep_clbits):
    """Sum out data bits not in ``keep_clbits`` (marginal estimate)."""
    positions = list(positions)
    k = len(positions)
    L = t.shape[0]
    for p in [p for p in positions if p not in keep_clbits]:
        j = positions.index(p)
        high, low = 1 << (k - 1 - j), 1 << j
        t = t.reshape(L, high, 2, low).sum(axis=2)
        positions.pop(j)
        k -= 1
        t = t.reshape(L, 1 << k)
    return t, positions


def _measured_here(virt, frag_name) -> dict[int, np.ndarray]:
    """vgate -> bool[n_inst]: does THIS fragment hold the measuring
    endpoint of variant v?  (The measuring side is always the owner —
    virt/tables.py owner_side convention — so exactly one fragment
    measures per measuring variant.)"""
    prog = virt.programs[frag_name]
    out: dict[int, np.ndarray] = {}
    for slot in prog.slots:
        spec = virt.vgates[slot.vgate_idx].spec
        m = np.array(
            [pair[slot.side].measure for pair in spec.endpoints], bool
        )
        g = slot.vgate_idx
        out[g] = out[g] | m if g in out else m
    return out


def _label_has_measure(virt, labels: np.ndarray) -> np.ndarray:
    """bool[L]: does the label's variant measure on ANY cut (either
    side)?  Labels without measuring variants are collapse-noise-free."""
    lab = np.asarray(labels)
    has = np.zeros(lab.shape[0], bool)
    for g, vg in enumerate(virt.vgates):
        m = np.array(
            [p[0].measure or p[1].measure for p in vg.spec.endpoints], bool
        )
        has |= m[lab[:, g]]
    return has


def _expand_measuring_counts(virt, uniq, counts, cap=None):
    """Replicate measuring unique labels so every SAMPLE gets its own
    independent collapse draw (collapse-mode rows are one-draw stochastic
    estimates; sharing a draw across a label's count would make the
    second-moment stderr underestimate the collapse noise — measured 7+
    sigma on qft-6 before this fix).  ``cap`` bounds replicas per label
    (cap=None = full per-sample independence, the honest default); with a
    cap the residual stderr understatement is <= count/cap on the capped
    (heavy, low-collapse-noise) labels.  Returns (labels [L', G],
    float_counts [L']) with sum(float_counts) == sum(counts)."""
    has = _label_has_measure(virt, uniq)
    c = counts.astype(np.int64)
    r = np.where(has, c if cap is None else np.minimum(c, int(cap)), 1)
    r = np.maximum(r, 1)
    labels = np.repeat(uniq, r, axis=0)
    fcounts = np.repeat(counts / r, r)
    return labels, fcounts


def _expand_measuring_mass(virt, rows, w, reps):
    """Head-path twin of :func:`_expand_measuring_counts`: exact-mass
    labels have no counts, so measuring labels get a fixed ``reps``
    independent draws (mass split evenly)."""
    has = _label_has_measure(virt, np.asarray(rows))
    r = np.where(has, max(1, int(reps)), 1)
    return np.repeat(rows, r, axis=0), np.repeat(np.asarray(w) / r, r)


def _collapse_head_groups(virt, head_rows, head_w, reps, est_fn,
                          control_variate, values, rebuild):
    """Collapse-mode stratified head with an HONEST stderr contribution.

    Head rows in collapse mode are one-draw stochastic estimates
    (expanded to ``reps`` independent draws per measuring label), NOT
    exact enumerations — treating the head as exact reports a standard
    error that omits its collapse noise entirely (zero when
    gamma_tail <= 0), the same failure mode
    :func:`_expand_measuring_counts` fixed on the tail (measured 7+
    sigma there).  The head mean is therefore computed from K
    independent replicate groups — the SAME total draw budget, ``reps``
    split across groups with distinct collapse seeds — and its
    per-outcome variance estimated as the sample variance of the group
    means / K (K-1 degrees of freedom; conservative-noisy but honest,
    and exactly zero at outcomes no collapse draw reaches).

    ``est_fn(rows, w, seed_offset)`` runs one group's estimate;
    ``values``/``rebuild`` adapt Distribution vs ndarray heads.
    Returns ``(head_est, head_var, head_stats)``; ``head_stats`` carries
    the control-variate ``y_mean`` (exact regardless of draws: collapse
    preserves row totals), or None.
    """
    K = 4 if reps >= 4 else 2
    g_rows, g_w = _expand_measuring_mass(
        virt, head_rows, head_w, max(1, reps // K)
    )
    groups, y_means = [], []
    template = None
    for k in range(K):
        out_k = est_fn(g_rows, g_w, 7717 * k)
        if control_variate:
            out_k, stats_k = out_k
            y_means.append(stats_k["y_mean"])
        template = out_k
        groups.append(np.asarray(values(out_k), np.float64))
    gm = np.stack(groups)
    head = rebuild(template, gm.mean(axis=0))
    head_var = gm.var(axis=0, ddof=1) / K
    stats = {"y_mean": float(np.mean(y_means))} if control_variate \
        else None
    return head, head_var, stats


def _collapse_flags(virt, collapse) -> list[bool]:
    """Per-fragment collapse-mode decision.  ``collapse``: True / False /
    "auto" — auto collapses a fragment when its ancilla-extended width
    is infeasible (> 2^24 states) or the deferral ancillas inflate the
    row width by > 2^8 over the data qubits (qft-16's lone-qubit
    fragment: 1 data + 15 ancillas)."""
    if isinstance(collapse, (list, tuple)):
        return [bool(c) for c in collapse]
    out = []
    for reg in virt.fragments:
        prog = virt.programs[reg.name]
        if collapse == "auto":
            out.append(
                prog.num_sim_qubits > 24
                or prog.num_sim_qubits - prog.num_data_qubits > 8
            )
        else:
            out.append(bool(collapse))
    return out


def _simulate_label_rows_collapse(virt, frag_name, lab, seed: int,
                                  dtype=None):
    """[L, 2^d] per-unique-label probability rows with vgate measurements
    COLLAPSED in-sim (variant_engine.collapse_qubit) and the fold weights
    already applied — the state width stays at the data qubits however
    many cuts measure (the ancilla path needs 2^(data+cuts): qft-16's
    15|1 split would be 2^30).  Rows are unbiased one-draw estimates of
    the exact folded rows; ``positions`` are the data clbits only.

    PARITY-CRITICAL: the weight convention must match
    :func:`_fold_rows_per_label` — variants measuring HERE fold at the
    collapse site with ``w[v, b]``; every other variant multiplies by
    ``w[v, 0]`` (owner-non-measuring coefficient, or 1 for non-owner
    rows).  Equality-in-expectation is locked by
    tests/test_collapse_mode.py."""
    fn, positions, n_sites, _w = _collapse_row_builder(
        virt, frag_name, dtype=dtype
    )
    rng = np.random.default_rng(seed)
    L = int(np.asarray(lab).shape[0])
    u = jnp.asarray(rng.random((L, max(1, n_sites))).astype(np.float32))
    rows, _pos = fn(jnp.asarray(lab), u)
    return rows, positions


def _collapse_row_builder(virt, frag_name, dtype=None):
    """(fn, positions, n_collapse_sites, width_qubits) for a collapse-mode
    fragment: ``fn(lab [l, G], u [l, >=n_sites]) -> (rows [l, 2^d],
    positions)`` is traceable (jit/scan-safe; the uniform draws come in
    as an argument) and returns rows FULLY folded over the vgate
    clbits."""
    prog = virt.programs[frag_name]
    sim_one, _, positions, _ = make_sim_fn(
        virt, frag_name, build_matrices=False, collapse=True, dtype=dtype,
    )
    tables = _slot_tables(prog, [vg.spec for vg in virt.vgates],
                          fused=False)
    weights = _sign_weights(virt, frag_name)
    ti_of = {g: i for i, g in enumerate(prog.touching)}
    mh = _measured_here(virt, frag_name)
    site_meta = []
    for ui, sid in enumerate(sim_one.collapse_slots):
        slot = prog.slots[sid]
        spec = virt.vgates[slot.vgate_idx].spec
        mrow = np.array(
            [1.0 if p[slot.side].measure else 0.0 for p in spec.endpoints],
            np.float32,
        )
        w = np.asarray(weights[ti_of[slot.vgate_idx]], np.float32)
        site_meta.append((sid, ui, slot.vgate_idx, mrow, w))
    nonmeas = [
        np.where(mh[g], 1.0, np.asarray(weights[ti])[:, 0]).astype(
            np.float32
        )
        for ti, g in enumerate(prog.touching)
    ]

    def fn(lab, u):
        cargs = {}
        for sid, ui, g, mrow, w in site_meta:
            v = lab[:, g]
            cargs[sid] = (
                u[:, ui],
                jnp.asarray(mrow)[v],
                jnp.asarray(w[:, 0])[v],
                jnp.asarray(w[:, 1])[v],
            )
        if prog.slots:
            mats = [
                tuple(jnp.asarray(t, dtype=dtype)[lab[:, slot.vgate_idx]]
                      for t in tabs)
                for slot, tabs in zip(prog.slots, tables)
            ]
            rows = jax.vmap(sim_one)(mats, cargs)
        else:
            row = sim_one([], {})
            rows = jnp.broadcast_to(row, (lab.shape[0], row.shape[0]))
        for ti, g in enumerate(prog.touching):
            rows = rows * jnp.asarray(nonmeas[ti], rows.dtype)[
                lab[:, g]][:, None]
        return rows, list(positions)

    width = max(len(sim_one.active_final), len(positions))
    return fn, positions, len(site_meta), width


def _collapse_row_builder_pallas(virt, frag_name, chunk, dtype=None,
                                 keep_clbits=None, z_sets=None):
    """Kernel-backed twin of :func:`_collapse_row_builder`: the per-label
    collapse-mode simulation runs through the whole-variant-in-VMEM
    Pallas kernel (ops/pallas_variant.make_collapse_chunk_kernel — the
    mid-circuit collapse executes IN-KERNEL on the resident state)
    instead of the XLA per-gate stream.  Same ``(fn, positions,
    n_sites, width)`` contract, same weight convention, same draws ->
    bit-identical branch picks; ``fn`` requires ``[chunk, G]`` label
    blocks (the blocked scan's shape).  Returns None when the fragment
    does not fit the kernel (width gate, non-f32 dtype) — callers fall
    back to the XLA builder.

    ``keep_clbits``: request the in-kernel-marginal kernel — returned
    ``positions`` are the kept clbits and rows are ``[chunk, 2^|kept|]``
    (_marginalize_rows then no-ops downstream).

    ``z_sets``: request the in-kernel Z-observable kernel — rows are
    ``[chunk, n_z + 1]`` pre-reduced signed contributions (+ total
    column); the returned ``fn`` carries ``fn.z_pre = True`` so the
    scan body skips its sign-matrix matmul."""
    if dtype is not None and dtype != jnp.float32:
        return None
    from .pallas_variant import make_collapse_chunk_kernel

    built = make_collapse_chunk_kernel(
        virt, frag_name, chunk,
        interpret=jax.default_backend() == "cpu",
        keep_clbits=keep_clbits, z_sets=z_sets,
    )
    if built is None:
        return None
    rows_fn, positions, site_meta = built
    prog = virt.programs[frag_name]
    weights = _sign_weights(virt, frag_name)
    ti_of = {g: i for i, g in enumerate(prog.touching)}
    mh = _measured_here(virt, frag_name)
    site_tabs = []
    for sid, g in site_meta:
        slot = prog.slots[sid]
        spec = virt.vgates[slot.vgate_idx].spec
        mrow = np.array(
            [1.0 if p[slot.side].measure else 0.0 for p in spec.endpoints],
            np.float32,
        )
        w = np.asarray(weights[ti_of[slot.vgate_idx]], np.float32)
        site_tabs.append(
            (g, jnp.asarray(mrow), jnp.asarray(w[:, 0]),
             jnp.asarray(w[:, 1]))
        )
    nonmeas = [
        np.where(mh[g], 1.0, np.asarray(weights[ti])[:, 0]).astype(
            np.float32
        )
        for ti, g in enumerate(prog.touching)
    ]

    def fn(lab, u):
        cols = [
            jnp.stack([u[:, si], mrow[lab[:, g]], w0t[lab[:, g]],
                       w1t[lab[:, g]]], axis=-1)
            for si, (g, mrow, w0t, w1t) in enumerate(site_tabs)
        ]
        cscal = (
            jnp.stack(cols, axis=1) if cols
            else jnp.zeros((lab.shape[0], 1, 4), jnp.float32)
        )
        rows = rows_fn(lab, cscal)
        # fold the owner-non-measuring coefficients into ONE per-label
        # scalar before touching the full-width rows (15 gathered
        # scalars + 1 row multiply, not 15 row multiplies — the rows are
        # 2^15 wide on the qft-16 flagship)
        nm = None
        for ti, g in enumerate(prog.touching):
            f = jnp.asarray(nonmeas[ti], rows.dtype)[lab[:, g]]
            nm = f if nm is None else nm * f
        if nm is not None:
            rows = rows * nm[:, None]
        return rows, list(positions)

    fn.z_pre = z_sets is not None
    return fn, positions, len(site_meta), len(positions)


def _ancilla_row_builder_pallas(virt, frag_name, chunk, dtype=None):
    """Kernel-backed twin of :func:`_ancilla_row_builder` (exact path):
    per-label rows from the whole-variant-in-VMEM kernel
    (ops/pallas_variant.make_chunk_kernel — the label matrix IS the
    kernel's per-chunk variant-index block, columns = global vgate ids),
    then the per-label fold.  Same contract; None when the fragment
    does not fit."""
    if dtype is not None and dtype != jnp.float32:
        return None
    from .pallas_variant import make_chunk_kernel

    built = make_chunk_kernel(
        virt, frag_name, chunk,
        interpret=jax.default_backend() == "cpu",
    )
    if built is None:
        return None
    rows_fn, positions = built

    def fn(lab, u):
        rows = rows_fn(lab)
        return _fold_rows_per_label(
            virt, frag_name, rows, lab, list(positions)
        )

    prog = virt.programs[frag_name]
    width = max(prog.num_sim_qubits, len(positions))
    return fn, list(positions), 0, width


def _ancilla_row_builder(virt, frag_name, dtype=None):
    """Exact-path twin of :func:`_collapse_row_builder`: ``fn(lab, u)``
    (u ignored) simulates with deferral ancillas then folds the vgate
    clbits per label.  Same (fn, positions, n_sites, width) contract so
    :func:`_scan_core` treats both modes uniformly."""
    prog = virt.programs[frag_name]
    sim_one, _, positions, _ = make_sim_fn(
        virt, frag_name, build_matrices=False, fused_slots=True,
        dtype=dtype,
    )
    tables = _slot_tables(
        prog, [vg.spec for vg in virt.vgates], fused=True
    )

    def fn(lab, u):
        if prog.slots:
            mats = [
                tuple(jnp.asarray(t, dtype=dtype)[lab[:, slot.vgate_idx]]
                      for t in tabs)
                for slot, tabs in zip(prog.slots, tables)
            ]
            rows = jax.vmap(sim_one)(mats)
        else:
            row = sim_one([])
            rows = jnp.broadcast_to(row, (lab.shape[0], row.shape[0]))
        return _fold_rows_per_label(
            virt, frag_name, rows, lab, positions
        )

    width = max(len(sim_one.active_final), len(positions))
    return fn, positions, 0, width


def _simulate_label_rows(virt, frag_name, lab, dtype=None):
    """[L, 2^k] probability rows for a fragment at each unique label —
    slot tables gathered by the label's per-vgate variant index (the
    slot's variant IS its vgate's label component; no flat-index table).
    ``dtype``: bf16 quantized serving (rows still come out f32 —
    finish_row accumulates probabilities in f32)."""
    prog = virt.programs[frag_name]
    sim_one, _, positions, _ = make_sim_fn(
        virt, frag_name, build_matrices=False, fused_slots=True,
        dtype=dtype,
    )
    tables = _slot_tables(
        prog, [vg.spec for vg in virt.vgates], fused=True
    )
    mats = [
        tuple(
            jnp.asarray(t, dtype=dtype)[lab[:, slot.vgate_idx]]
            for t in tabs
        )
        for slot, tabs in zip(prog.slots, tables)
    ]
    if mats:
        rows = jax.vmap(sim_one)(mats)
    else:
        row = sim_one([])
        rows = jnp.broadcast_to(row, (lab.shape[0], row.shape[0]))
    return rows, positions


def _simulate_label_rows_noisy(
    virt, frag_name, lab_np, nm, seed: int, chunk_size: int = 256,
):
    """[L, 2^k] TRAJECTORY-AVERAGED noisy probability rows per unique
    label, with the calibrated readout channel applied — the sampled-
    label restriction of ops/noise.run_fragment_noisy (noisy hardware x
    many cuts: the reference's Aer-with-FakeBackend role at
    /root/reference/third_party/qvm/qvm/run.py:24-42, at budgets its
    full enumeration can't reach).  The trajectory axis is balanced PER
    LABEL (ops/noise._pauli_idx) and averaged before folding."""
    from .noise import (
        _apply_rows_readout,
        _sample_site_blocks,
        _site_active,
        frag_clbit_qubits,
    )
    from .variant_engine import chunk_cap, scan_variant_rows

    prog = virt.programs[frag_name]
    sim_one, _, positions, _ = make_sim_fn(
        virt, frag_name, noise=nm, build_matrices=False
    )
    specs = [vg.spec for vg in virt.vgates]
    tables = _slot_tables(prog, specs, fused=False)
    L = lab_np.shape[0]
    rng = np.random.default_rng(seed)
    assert all(w is None for (_, _, _, _, w) in sim_one.noise_sites), (
        "PEC (signed quasi-sites) is batched-engine-only: "
        "run_noisy_virtual_circuit(engine='auto')"
    )
    site_tabs = [(pr, bank) for (_, _, pr, bank, _) in sim_one.noise_sites]
    k_traj = (
        nm.trajectories
        if any(_site_active(pr) for pr, _ in site_tabs) else 1
    )
    cq = dict(frag_clbit_qubits(virt, frag_name))
    if sim_one.readout_device is not None:
        cq.update({
            c: d for c, d in sim_one.readout_device.items()
            if d is not None
        })
    width = max(1, 2 ** len(positions))
    if not prog.slots:
        if site_tabs and k_traj > 1:
            pauli = _sample_site_blocks(rng, site_tabs, (k_traj,),
                                        balance_axis=0)
            rows = jax.vmap(lambda pm: sim_one([], pm))(pauli)
            row = jnp.mean(rows, axis=0)
        elif site_tabs:
            row = sim_one([], _sample_site_blocks(rng, site_tabs, ()))
        else:
            row = sim_one([])
        values = np.broadcast_to(np.asarray(row), (L, width)).copy()
    else:
        total = L * k_traj
        v_idx = np.repeat(np.arange(L), k_traj)
        batched = [
            tuple(
                np.asarray(t)[lab_np[:, slot.vgate_idx]][v_idx]
                for t in tabs
            )
            for slot, tabs in zip(prog.slots, tables)
        ]
        if site_tabs:
            pauli = [
                b.reshape((total,) + b.shape[2:])
                for b in _sample_site_blocks(rng, site_tabs, (L, k_traj),
                                             balance_axis=1)
            ]
            args = (batched, pauli)
        else:
            args = (batched,)
        chunk = min(chunk_size, total, chunk_cap(prog.num_sim_qubits))
        values = scan_variant_rows(sim_one, args, total, chunk)
        values = values.reshape(L, k_traj, width).mean(axis=1)
    values = _apply_rows_readout(np.asarray(values), positions, nm, cq)
    return jnp.asarray(values), positions


def _noise_models(virt: VirtualCircuit, noise):
    """Normalise ``noise`` into a per-fragment NoiseModel list (None =
    exact), with the reference's untranspiled-fragment semantics
    (ops/noise.run_noisy_virtual_circuit: fragments of an untranspiled
    model run noise-free — their instantiations' gates match no
    calibration entry)."""
    if noise is None:
        return None
    if isinstance(noise, (list, tuple)):
        models = list(noise)
    else:
        models = [noise] * len(virt.fragments)
    assert len(models) >= len(virt.fragments)
    models = [
        None if (m is not None and getattr(m, "untranspiled", False))
        else m
        for m in models[: len(virt.fragments)]
    ]
    return None if all(m is None for m in models) else models


def _label_budget() -> int:
    """Per-scan-block float budget (labels x 2^width) — the tunneled
    TPU's compile time scales with the largest program buffer (verify
    SKILL.md: keep <= 2^20 floats); CPU compiles locally and larger
    blocks amortise dispatch."""
    return (1 << 23) if jax.default_backend() == "cpu" else (1 << 19)


def _scan_core(
    virt: VirtualCircuit,
    labels: np.ndarray,
    mass: np.ndarray,
    *,
    z_sets=None,
    keep_clbits=None,
    second_moment: bool = False,
    control_stats: bool = False,
    gamma_override: float | None = None,
    dtype=None,
    flags=None,
    collapse_seed: int = 0,
    block: int = 32,
    pallas_variant: bool = False,
    mesh=None,
):
    """Blocked twin of :func:`_estimate` / :func:`_estimate_z`: one
    ``lax.scan`` over label chunks accumulates the weighted knit (and the
    optional second-moment / control-variate statistics), so the peak
    buffer is ``block x 2^width`` instead of ``L x 2^width`` — the only
    way to run qft-16-class sampled estimates (L ~ 10^5 rows of 2^15)
    on the tunneled TPU, whose compile time scales with the largest
    program buffer.  One jit, one dispatch.  Estimator semantics are
    identical (the per-label pipeline is the same code; the tests assert
    equality vs the unblocked path on CPU-scale circuits)."""
    from jax import lax

    gamma_total = (
        sampling_overhead(virt)["gamma_total"]
        if gamma_override is None else float(gamma_override)
    )
    lab_np = np.asarray(labels, np.int32)
    mass = np.asarray(mass, np.float64)
    L, G = lab_np.shape
    flags = flags if flags is not None else [False] * len(virt.fragments)

    # scan length BUCKETING + a per-virt jit cache: a serving loop
    # re-estimates on the same VirtualCircuit with slightly different
    # unique-label counts; without bucketing every distinct L is a new
    # scan length -> a new trace + lowering + (server) compile per call.
    # Rounding nb up to a 3-bit mantissa (<= 12.5% padded work, padding
    # rows carry zero mass) plus caching the jitted scan on the virt
    # makes repeat estimates pure executions.  The Mosaic kernel path
    # (pallas_variant) gains the most: its LOCAL re-lowering cost
    # ~20 s/call on this host (collapse_ab_probe.json analysis).
    nb = max(1, -(-L // block))
    if nb > 8:
        e = max(0, nb.bit_length() - 4)
        nb = -(-nb >> e) << e
    # dp sharding of the label-block axis (SURVEY §2.5: the variant/label
    # fan-out is the dominant data-parallel axis): each device scans its
    # own nb/dp blocks, the accumulated knit carries psum over "dp"
    dp = int(mesh.shape["dp"]) if mesh is not None else 1
    if dp > 1:
        nb = -(-nb // dp) * dp
    pad = nb * block - L

    key = (
        "scan", nb, block, G, tuple(flags), bool(pallas_variant),
        None if mesh is None else (id(mesh), tuple(mesh.shape.items())),
        None if keep_clbits is None else tuple(sorted(keep_clbits)),
        None if z_sets is None
        else tuple(tuple(sorted(s)) for s in z_sets),
        bool(second_moment), bool(control_stats),
        None if dtype is None else str(dtype),
    )
    cache = virt.__dict__.setdefault("_scan_step_cache", {})
    ent = cache.get(key)

    builders = []
    z_pre = []  # per fragment: builder returns pre-reduced z columns
    u_specs = []  # (random?, n_cols) per fragment — u draws are data
    pos_static = []
    pos_raw = []
    ns_raw = []
    kernel_routed = []  # (name, backed-by-VMEM-kernel?) at cache build
    for fi, reg in enumerate(virt.fragments):
        if flags[fi]:
            if ent is None:
                built = (
                    _collapse_row_builder_pallas(
                        virt, reg.name, block, dtype=dtype,
                        keep_clbits=keep_clbits, z_sets=z_sets,
                    )
                    if pallas_variant else None
                )
                kernel_routed.append((reg.name, built is not None))
                if built is not None:
                    fn, pos, ns, _w = built
                else:
                    fn, pos, ns, _w = _collapse_row_builder(
                        virt, reg.name, dtype=dtype
                    )
            else:
                fn, ns = None, ent["ns"][fi]
                pos = ent["pos_raw"][fi]
            u_specs.append((True, max(1, ns)))
            pos_f = list(pos)
        else:
            if ent is None:
                built = (
                    _ancilla_row_builder_pallas(
                        virt, reg.name, block, dtype=dtype
                    )
                    if pallas_variant else None
                )
                kernel_routed.append((reg.name, built is not None))
                if built is not None:
                    fn, pos, ns, _w = built
                else:
                    fn, pos, ns, _w = _ancilla_row_builder(
                        virt, reg.name, dtype=dtype
                    )
            else:
                fn, ns = None, ent["ns"][fi]
                pos = ent["pos_raw"][fi]
            u_specs.append((False, 1))
            pos_f = [p for p in pos if p < virt.num_clbits]
        if keep_clbits is not None:
            pos_f = [p for p in pos_f if p in set(keep_clbits)]
        builders.append(fn)
        z_pre.append(bool(getattr(fn, "z_pre", False)))
        pos_static.append(pos_f)
        pos_raw.append(list(pos))
        ns_raw.append(ns)

    if pallas_variant and ent is None:
        # advisor r4: an opted-in sample_pallas run must not silently
        # degrade to the XLA builders with no runtime signal (once per
        # unique scan build — repeats hit the cache above)
        from ..utils.logger import get_logger

        log = get_logger(__name__)
        routed = [n for n, ok in kernel_routed if ok]
        fell_back = [n for n, ok in kernel_routed if not ok]
        log.info(
            f"sample_pallas: VMEM kernel backs {routed or 'NO'} "
            f"fragment(s); XLA builder fallback for {fell_back or 'none'}"
        )
        if not routed:
            log.warning(
                "sample_pallas had no effect: every fragment is outside "
                "the kernel's gate (width/VMEM gate, f32 only) — the "
                "sampled scan runs entirely on the XLA builders"
            )

    u_cols = []
    for fi, (rand, ncols) in enumerate(u_specs):
        if rand:
            rng = np.random.default_rng(collapse_seed + 7919 * fi)
            u_cols.append(rng.random((L, ncols)).astype(np.float32))
        else:
            u_cols.append(np.zeros((L, ncols), np.float32))
    if pad:
        pad_lab = np.zeros((pad, G), np.int32) if L == 0 else \
            np.repeat(lab_np[:1], pad, axis=0)
        lab_np = np.concatenate([lab_np, pad_lab])
        mass = np.concatenate([mass, np.zeros(pad)])
        u_cols = [
            np.concatenate(
                [u, np.full((pad, u.shape[1]), 0.5, np.float32)]
            )
            for u in u_cols
        ]
    w_all = (mass * gamma_total).astype(np.float32)
    w2_all = (mass * (gamma_total * gamma_total)).astype(np.float32)

    # output layout (dist mode): LAST fragment = LOW bits (knit_values
    # convention), then one permutation to ascending clbit order
    src_bits: list[int] = []
    for pos_f in reversed(pos_static):
        src_bits.extend(pos_f)
    dst_bits = sorted(src_bits)
    if z_sets is None:
        out_w = 1 << len(src_bits)
    else:
        out_w = len(z_sets)

    def _comb(w_c, rows_list):
        operands = [w_c, [0]]
        for i, rows in enumerate(rows_list):
            operands += [rows, [0, 1 + i]]
        return jnp.einsum(
            *operands, list(range(1, 1 + len(rows_list)))
        ).reshape(-1)

    def body(carry, x):
        lab_c, w_c, w2_c, u_c = x
        rows_list = []
        for fi, fn in enumerate(builders):
            rows, pos = fn(lab_c, u_c[fi])
            if keep_clbits is not None:
                rows, pos = _marginalize_rows(rows, pos, keep_clbits)
            assert pos == pos_static[fi], (pos, pos_static[fi])
            rows_list.append(rows)
        if z_sets is None:
            val = _comb(w_c, rows_list)
            val2 = (
                _comb(w2_c, [r * r for r in rows_list])
                if (second_moment or control_stats) else jnp.zeros(())
            )
        else:
            prodmat = None
            for fi, (rows, pos) in enumerate(zip(rows_list, pos_static)):
                # pre-reduced builders (in-kernel z) already carry the
                # signed contributions; others go through the matrix
                sc = (
                    rows[:, : len(z_sets)] if z_pre[fi]
                    else rows @ _z_sign_matrix(pos, z_sets, rows.dtype)
                )
                prodmat = sc if prodmat is None else prodmat * sc
            val = w_c @ prodmat
            val2 = (
                w2_c @ (prodmat * prodmat)
                if (second_moment or control_stats) else jnp.zeros(())
            )
        if control_stats:
            totals = None
            for fi, r in enumerate(rows_list):
                t = (
                    r[:, len(z_sets)]
                    if (z_sets is not None and z_pre[fi])
                    else r.sum(axis=1)
                )
                totals = t if totals is None else totals * t
            ym = jnp.vdot(w_c, totals)
            y2 = jnp.vdot(w2_c, totals * totals)
            if z_sets is None:
                xy = _comb(w2_c * totals, rows_list)
            else:
                xy = (w2_c * totals) @ prodmat
        else:
            ym = y2 = jnp.zeros(())
            xy = jnp.zeros(())
        est, m2, ym0, y20, xy0 = carry
        return (est + val, m2 + val2, ym0 + ym, y20 + y2, xy0 + xy), None

    def run(lab_x, w_x, w2_x, u_xs):
        xs = (
            lab_x.reshape(nb, block, G),
            w_x.reshape(nb, block),
            w2_x.reshape(nb, block),
            tuple(u.reshape(nb, block, -1) for u in u_xs),
        )
        carry0 = (
            jnp.zeros(out_w, jnp.float32),
            jnp.zeros(out_w, jnp.float32)
            if (second_moment or control_stats) else jnp.zeros(()),
            jnp.zeros(()), jnp.zeros(()),
            jnp.zeros(out_w, jnp.float32)
            if control_stats else jnp.zeros(()),
        )
        if mesh is None:
            carry, _ = lax.scan(body, carry0, xs)
        else:
            from jax.sharding import PartitionSpec as P

            def local(lab_s, w_s, w2_s, *u_s):
                # the closed-over zero carry is device-invariant; mark it
                # varying over dp so the scan's carry types line up
                c0 = jax.tree_util.tree_map(
                    lambda x: jax.lax.pvary(x, ("dp",)), carry0
                )
                c, _ = lax.scan(
                    body, c0, (lab_s, w_s, w2_s, tuple(u_s))
                )
                return tuple(jax.lax.psum(x, "dp") for x in c)

            ns = P("dp")
            carry = jax.shard_map(
                local, mesh=mesh,
                in_specs=(ns, ns, ns) + tuple(ns for _ in xs[3]),
                out_specs=P(),
            )(xs[0], xs[1], xs[2], *xs[3])
        est, m2, ym, y2, xy = carry
        if z_sets is None and src_bits:
            est = permute_bits_flat(est, src_bits, dst_bits)
            if second_moment or control_stats:
                m2 = permute_bits_flat(m2, src_bits, dst_bits)
            if control_stats:
                xy = permute_bits_flat(xy, src_bits, dst_bits)
        return est, m2, ym, y2, xy

    if ent is None:
        ent = {"run": jax.jit(run), "ns": ns_raw, "pos_raw": pos_raw}
        cache[key] = ent
    est, m2, ym, y2, xy = ent["run"](
        jnp.asarray(lab_np), jnp.asarray(w_all), jnp.asarray(w2_all),
        tuple(jnp.asarray(u) for u in u_cols),
    )
    if z_sets is None:
        est_out = Distribution(
            np.asarray(est), dst_bits, virt.num_clbits
        )
    else:
        est_out = np.asarray(est, np.float64)
    if not (second_moment or control_stats):
        return est_out
    out = [est_out]
    if second_moment:
        out.append(np.asarray(m2, np.float64))
    if control_stats:
        out.append({
            "y_mean": float(ym),
            "y2": float(y2),
            "xy": np.asarray(xy, np.float64),
        })
    return tuple(out)


def _estimate(
    virt: VirtualCircuit,
    labels: np.ndarray,
    mass: np.ndarray,
    keep_clbits=None,
    second_moment: bool = False,
    dtype=None,
    gamma_override: float | None = None,
    control_stats: bool = False,
    noise=None,
    noise_seed: int = 0,
    collapse=None,
    collapse_seed: int = 0,
    pallas_variant: bool = False,
    mesh=None,
):
    """Core estimator: ``sum_l mass[l] * gamma_total * signed_knit(l)``.

    With ``labels`` = the full label grid and ``mass`` = each label's
    exact sampling probability this reproduces the exact knit (the
    identity the estimator is unbiased against — tested); with sampled
    unique labels and ``mass = counts / num_samples`` it is the
    Monte-Carlo estimate.

    ``second_moment``: also return ``E[X^2]`` per outcome (X = the
    per-sample weighted value ``gamma * signed_knit``; the per-label
    square factors over the disjoint fragment bit groups, so it is the
    same einsum over squared rows) — the ingredient for standard
    errors.

    ``gamma_override``: per-sample weight scale replacing gamma_total —
    the stratified tail samples from the CONDITIONAL distribution over
    tail labels, whose normalisation is gamma_tail (see
    :func:`stratified_split`).

    ``control_stats``: additionally return the control-variate moments
    built on the per-label signed TOTAL mass ``Y_l = gamma *
    total_l`` where ``total_l = prod_f sum_x folded_rows_f[l, x]``
    (marginalisation preserves row sums, so totals are keep_clbits-
    independent): ``{"y_mean": E^[Y], "y2": E^[Y^2], "xy": E^[X Y] per
    outcome}``.  ``E[Y] = sum_x exact_knit(x) = 1`` exactly (trace
    preservation), making Y a zero-cost control variate — see
    :func:`sampled_knit`'s ``control_variate``."""
    gamma_total = (
        sampling_overhead(virt)["gamma_total"]
        if gamma_override is None else float(gamma_override)
    )
    flags = collapse if collapse is not None else \
        [False] * len(virt.fragments)
    lab_np = np.asarray(labels, np.int32)
    mass = np.asarray(mass, np.float64)
    if noise is None and len(lab_np):
        max_w = max(
            virt.programs[r.name].num_data_qubits if flags[fi]
            else virt.programs[r.name].num_sim_qubits
            for fi, r in enumerate(virt.fragments)
        )
        blk = max(1, _label_budget() >> max_w)
        # in-kernel-marginal route: when EVERY fragment either runs the
        # marginal VMEM kernel (collapse mode, kept outcomes <= 128) or
        # is naturally narrow, the per-step HBM row buffer is <= 128
        # floats/label — the compile-time budget re-evaluates at the
        # EFFECTIVE width and the scan runs far larger label blocks
        # (qft-16: block 16 -> 4096, 26 scan steps instead of 6.6k)
        if (pallas_variant and keep_clbits is not None
                and dtype in (None, jnp.float32)):
            eff_w = 1
            ok = True
            for fi, r in enumerate(virt.fragments):
                if not flags[fi]:
                    ok = False
                    break
                w = virt.programs[r.name].num_data_qubits
                if w > 7:
                    if _collapse_row_builder_pallas(
                        virt, r.name, 8, dtype=dtype,
                        keep_clbits=keep_clbits,
                    ) is None:
                        ok = False
                        break
                    w = 7
                eff_w = max(eff_w, w)
            if ok:
                blk = max(blk, max(1, _label_budget() >> max(eff_w, 7)))
        if mesh is not None or len(lab_np) > blk:
            return _scan_core(
                virt, lab_np, mass, keep_clbits=keep_clbits,
                second_moment=second_moment,
                control_stats=control_stats,
                gamma_override=gamma_override, dtype=dtype,
                flags=flags, collapse_seed=collapse_seed, block=blk,
                pallas_variant=pallas_variant, mesh=mesh,
            )
    lab = jnp.asarray(lab_np)
    frag_rows = []
    frag_positions = []
    for fi, reg in enumerate(virt.fragments):
        nm = noise[fi] if noise is not None else None
        if nm is None and flags[fi]:
            # collapse mode folds the vgate clbits in-sim
            built = (
                _collapse_row_builder_pallas(
                    virt, reg.name, int(lab.shape[0]), dtype=dtype
                )
                if pallas_variant else None
            )
            if built is not None:
                fn_p, positions, ns_p, _w = built
                rng = np.random.default_rng(collapse_seed + 7919 * fi)
                u = jnp.asarray(
                    rng.random(
                        (int(lab.shape[0]), max(1, ns_p))
                    ).astype(np.float32)
                )
                rows, positions = fn_p(lab, u)
            else:
                rows, positions = _simulate_label_rows_collapse(
                    virt, reg.name, lab,
                    seed=collapse_seed + 7919 * fi, dtype=dtype,
                )
        else:
            built = (
                _ancilla_row_builder_pallas(
                    virt, reg.name, int(lab.shape[0]), dtype=dtype
                )
                if (pallas_variant and nm is None) else None
            )
            if built is not None:
                rows, positions = built[0](lab, None)
            else:
                if nm is None:
                    rows, positions = _simulate_label_rows(
                        virt, reg.name, lab, dtype=dtype
                    )
                else:
                    rows, positions = _simulate_label_rows_noisy(
                        virt, reg.name, lab_np, nm, seed=noise_seed + fi
                    )
                rows, positions = _fold_rows_per_label(
                    virt, reg.name, rows, lab, positions
                )
        if keep_clbits is not None:
            rows, positions = _marginalize_rows(
                rows, positions, keep_clbits
            )
        frag_rows.append(rows)
        frag_positions.append(positions)

    # mirror knit_values' layout: LAST fragment axis = LOW bits, then
    # permute to global ascending clbit order
    src_bits: list[int] = []
    for pos_list in reversed(frag_positions):
        src_bits.extend(pos_list)
    dst_bits = sorted(src_bits)

    def combine(weights_l, rows_list):
        # one weighted einsum over the label axis: 'l,la,lb,...->ab...'
        operands = [weights_l, [0]]
        for i, rows in enumerate(rows_list):
            operands += [rows, [0, 1 + i]]
        merged = jnp.einsum(
            *operands, list(range(1, 1 + len(rows_list)))
        ).reshape(-1)
        return permute_bits_flat(merged, src_bits, dst_bits)

    dt = frag_rows[0].dtype
    w = jnp.asarray(mass, dt) * gamma_total
    est = Distribution(
        np.asarray(combine(w, frag_rows)), dst_bits, virt.num_clbits
    )
    if not (second_moment or control_stats):
        return est
    out = [est]
    w2 = jnp.asarray(mass, dt) * (gamma_total * gamma_total)
    if second_moment:
        out.append(np.asarray(combine(w2, [r * r for r in frag_rows])))
    if control_stats:
        totals = frag_rows[0].sum(axis=1)
        for r in frag_rows[1:]:
            totals = totals * r.sum(axis=1)
        out.append({
            "y_mean": float(jnp.vdot(w, totals)),
            "y2": float(jnp.vdot(w2, totals * totals)),
            "xy": np.asarray(combine(w2 * totals, frag_rows)),
        })
    return tuple(out)


def _cv_adjust(est_values, m2, stats, y_expect):
    """Per-outcome control-variate regression (CV4Quantum role,
    arXiv:2502.08735, PAPERS.md — adapted from observable PEC to
    distribution knitting).

    X(x) = per-sample weighted signed-knit value at outcome x;
    Y = per-sample weighted signed TOTAL mass, with EXACT expectation
    ``y_expect`` (1 for the plain estimator; the tail's exact mass for
    the stratified tail).  The adjusted estimator

        X_cv(x) = X(x) - beta(x) * (Y - y_expect),
        beta(x) = Cov(X(x), Y) / Var(Y)

    stays unbiased up to the O(1/N) plug-in-beta term (beta estimated
    from the same sample — standard, vanishes as 1/N) and has variance
    Var(X)(1 - rho^2): the shared +/-gamma sign-product noise, the
    dominant variance source on coherent plans, cancels wherever X(x)
    tracks the total.  Returns ``(adjusted_values, adjusted_var)``
    with ``adjusted_var`` the per-outcome variance of X_cv (divide by N
    for the squared stderr)."""
    var_y = max(stats["y2"] - stats["y_mean"] ** 2, 0.0)
    var_x = np.maximum(m2 - est_values**2, 0.0)
    if var_y <= 1e-30:  # degenerate Y (single label / constant totals)
        return est_values, var_x
    cov = stats["xy"] - est_values * stats["y_mean"]
    beta = cov / var_y
    adj = est_values - beta * (stats["y_mean"] - y_expect)
    adj_var = np.maximum(var_x - cov * cov / var_y, 0.0)
    return adj, adj_var


def sampled_knit_adaptive(
    virt: VirtualCircuit,
    eps: float,
    seed: int = 0,
    keep_clbits=None,
    dtype=None,
    head_labels: int = 0,
    method: str = "iid",
    initial: int = 4096,
    max_samples: int = 2_000_000,
    control_variate: bool = False,
    noise=None,
    noise_seed: int = 0,
    collapse="auto",
    collapse_reps: int | None = None,
    pallas_variant: bool = False,
    mesh=None,
):
    """eps-targeted sampling: grow the budget until the worst per-outcome
    EMPIRICAL standard error is <= ``eps``, then stop.

    The analytic Hoeffding budget ``kappa / eps^2`` (:func:`sampling_overhead`)
    is a worst-case bound; the sample's own moments are usually far
    tighter (signs cancel coherently on real plans, and the stratified
    head removes the heavy labels' variance entirely).  Each round
    re-draws ``n`` fresh samples (seeds disjoint per round) and
    quadruples ``n`` until the target is met, so total work is <= 4/3 of
    the final round's — re-simulation cost stays bounded because rows
    are only computed for deduplicated labels, whose count saturates.

    Returns ``(estimate, stderr, samples_used)``.  If ``max_samples`` is
    reached above ``eps`` the best estimate is returned with a warning —
    callers can check ``stderr.max()``.  Composes with ``head_labels``
    (stratified), ``method="lhs"`` (balanced; the iid stderr formula
    upper-bounds the true LHS variance, so the stop rule stays sound),
    ``keep_clbits`` and bf16 ``dtype``.

    Reference contrast: the reference always enumerates the full label
    grid (qvm/run.py:36-42) — there is no accuracy dial; this is the
    serving-side knob that buys back the exponential cut-count cost at a
    chosen accuracy."""
    if eps <= 0.0:
        raise ValueError(f"eps must be positive, got {eps}")
    from ..utils.logger import get_logger

    n = max(1, min(int(initial), int(max_samples)))
    round_idx = 0
    while True:
        # wide seed stride: sample_label_counts advances its seed by 1
        # per chunk, so adjacent round seeds would overlap streams
        est, se = sampled_knit(
            virt, n, seed=seed + round_idx * 1_000_003,
            keep_clbits=keep_clbits,
            with_stderr=True, dtype=dtype, head_labels=head_labels,
            method=method, control_variate=control_variate,
            noise=noise, noise_seed=noise_seed + round_idx,
            collapse=collapse, collapse_reps=collapse_reps,
            pallas_variant=pallas_variant, mesh=mesh,
        )
        worst = float(se.max()) if se.size else 0.0
        if worst <= eps or n >= max_samples:
            if worst > eps:
                get_logger(__name__).warning(
                    f"sampled_knit_adaptive: budget exhausted at "
                    f"{n} samples with stderr {worst:.3g} > eps={eps:.3g}"
                    " — returning the best estimate (raise max_samples "
                    "for a tighter answer)"
                )
            return est, se, n
        # scale the next round by the measured variance ratio, snapped
        # to at least 4x so the geometric-work bound holds
        n = min(int(max_samples),
                max(4 * n, int(n * (worst / eps) ** 2)))
        round_idx += 1


def sampled_knit(
    virt: VirtualCircuit,
    num_samples: int,
    seed: int = 0,
    keep_clbits=None,
    with_stderr: bool = False,
    dtype=None,
    head_labels: int = 0,
    method: str = "iid",
    control_variate: bool = False,
    noise=None,
    noise_seed: int = 0,
    collapse="auto",
    collapse_reps: int | None = None,
    pallas_variant: bool = False,
    mesh=None,
):
    """Unbiased Monte-Carlo estimate of the knitted distribution from
    ``num_samples`` QPD samples — only the sampled labels' instances are
    simulated (deduplicated), instead of the full ``prod_g n_g`` grid.

    ``noise``: one NoiseModel, a per-fragment list, or None — the
    sampled labels' instances run through the trajectory-noise engine
    with calibrated readout (:func:`_simulate_label_rows_noisy`),
    estimating the NOISY knit (the reference's FakeBackend execution at
    budgets exhaustive enumeration can't reach).  E[Y] = 1 still holds
    (every noise channel is trace-preserving), so ``control_variate``
    and the stderr/stratified/LHS machinery compose unchanged.
    Exclusive with bf16 ``dtype`` (the noise path is f32).

    Per-outcome standard error ~ ``gamma_total / sqrt(num_samples)``;
    see :func:`sampling_overhead` for the budget.  ``keep_clbits``
    estimates a marginal (wide circuits) without materialising the full
    distribution.  ``with_stderr``: additionally return the per-outcome
    standard error of the estimate, ``sqrt((E[X^2] - E[X]^2) /
    num_samples)`` from the sample's own moments.

    ``head_labels``: stratified estimator — enumerate the up-to-that-
    many heaviest labels exactly and spend the whole sample budget on
    the tail (:func:`stratified_split`): stderr scale drops from
    gamma_total to gamma_tail.  No-op on uniform-coefficient cut sets.

    ``method="lhs"``: balanced (Latin-hypercube) label sampling — pins
    each cut's empirical variant counts to their expectation (see
    :func:`sample_labels`); composes with ``head_labels`` (the tail is
    drawn balanced, then rejection-filtered).  The ``with_stderr``
    estimate keeps the iid formula, which upper-bounds the true LHS
    variance (conservative).

    ``control_variate``: regress each outcome against the per-sample
    signed total mass, whose exact expectation is known (1, by trace
    preservation) — see :func:`_cv_adjust`.  Zero extra simulation (the
    totals are row sums of rows already computed); cancels the shared
    sign-product noise wherever an outcome's value tracks the total.
    Composes with every other knob; under ``head_labels`` the tail is
    regressed against its own exact mass ``1 - head_mass``."""
    noise = _noise_models(virt, noise)
    if noise is not None and dtype is not None:
        raise ValueError("noise and bf16 dtype are exclusive "
                         "(the trajectory-noise path is f32)")
    cflags = _collapse_flags(virt, collapse)
    if noise is not None and any(cflags):
        raise ValueError("collapse mode is exact-path only; fragments "
                         "with noise models cannot collapse")
    if noise is not None and mesh is not None:
        raise ValueError(
            "mesh (dp-sharded sampled scan) and noise are exclusive: "
            "the trajectory-noise path runs single-device, so the mesh "
            "would be silently ignored — drop mesh= or noise="
        )
    ckw = dict(collapse=cflags, pallas_variant=pallas_variant,
               mesh=mesh)
    split = stratified_split(virt, head_labels) if head_labels else None
    if split is None:
        uniq, counts = sample_label_counts(virt, num_samples, seed,
                                           method=method)
        if any(cflags):
            uniq, fc = _expand_measuring_counts(
                virt, uniq, counts.astype(np.float64), cap=collapse_reps
            )
            mass = fc / num_samples
        else:
            mass = counts.astype(np.float64) / num_samples
        if not (with_stderr or control_variate):
            return _estimate(virt, uniq, mass, keep_clbits, dtype=dtype,
                             noise=noise, noise_seed=noise_seed,
                             collapse_seed=seed * 31 + 17, **ckw)
        est, m2, *rest = _estimate(
            virt, uniq, mass, keep_clbits, second_moment=True,
            dtype=dtype, control_stats=control_variate,
            noise=noise, noise_seed=noise_seed,
            collapse_seed=seed * 31 + 17, **ckw,
        )
        vals = np.asarray(est.values)
        if control_variate:
            vals, var = _cv_adjust(vals, m2, rest[0], 1.0)
            est = Distribution(vals, est.bit_positions, virt.num_clbits)
        else:
            var = np.maximum(m2 - vals**2, 0.0)
        if not with_stderr:
            return est
        return est, np.sqrt(var / num_samples)

    head_rows, head_w, thresh, gamma_head, gamma_tail = split
    head_var = None
    if any(cflags) and (with_stderr or control_variate):
        # collapse-mode head rows are stochastic — estimate their
        # variance from replicate groups (advisor r4: the head carries
        # most of the mass, so omitting its collapse noise materially
        # understates the reported stderr)
        head, head_var, head_stats = _collapse_head_groups(
            virt, head_rows, head_w, collapse_reps or 16,
            lambda rows, w, off: _estimate(
                virt, rows, w, keep_clbits, dtype=dtype,
                gamma_override=1.0, control_stats=control_variate,
                noise=noise, noise_seed=noise_seed,
                collapse_seed=seed * 31 + 29 + off, **ckw,
            ),
            control_variate,
            values=lambda h: h.values,
            rebuild=lambda h, v: Distribution(
                v, h.bit_positions, virt.num_clbits
            ),
        )
    else:
        if any(cflags):
            head_rows, head_w = _expand_measuring_mass(
                virt, head_rows, head_w, collapse_reps or 16
            )
        # head masses ARE the final per-label weights (gamma_override=1)
        head_out = _estimate(
            virt, head_rows, head_w, keep_clbits, dtype=dtype,
            gamma_override=1.0, control_stats=control_variate,
            noise=noise, noise_seed=noise_seed,
            collapse_seed=seed * 31 + 29, **ckw,
        )
        head, head_stats = head_out if control_variate \
            else (head_out, None)
    if gamma_tail <= 0.0:
        # the head IS the whole grid: exact unless collapse draws fed it
        if with_stderr:
            hv = head_var if head_var is not None \
                else np.zeros_like(np.asarray(head.values))
            return head, np.sqrt(hv)
        return head
    uniq, counts = _sample_tail_counts(virt, num_samples, thresh, seed,
                                       method=method)
    if any(cflags):
        uniq, fc = _expand_measuring_counts(
            virt, uniq, counts.astype(np.float64), cap=collapse_reps
        )
        mass = fc / num_samples
    else:
        mass = counts.astype(np.float64) / num_samples
    if not (with_stderr or control_variate):
        tail = _estimate(virt, uniq, mass, keep_clbits, dtype=dtype,
                         gamma_override=gamma_tail,
                         noise=noise, noise_seed=noise_seed + 503,
                         collapse_seed=seed * 31 + 43, **ckw)
        return Distribution(
            np.asarray(head.values) + np.asarray(tail.values),
            head.bit_positions, virt.num_clbits,
        )
    tail, m2, *rest = _estimate(
        virt, uniq, mass, keep_clbits, second_moment=True, dtype=dtype,
        gamma_override=gamma_tail, control_stats=control_variate,
        noise=noise, noise_seed=noise_seed + 503,
        collapse_seed=seed * 31 + 43, **ckw,
    )
    # the tail's sampling variance, plus the head's collapse-draw
    # variance when collapse mode fed it (head_var is None on the exact
    # enumeration path)
    tail_vals = np.asarray(tail.values)
    if control_variate:
        # the head's y_mean IS its exact mass (weights are exact, and
        # collapse preserves row totals), so the tail total's exact
        # expectation is 1 - head_mass
        tail_vals, var = _cv_adjust(
            tail_vals, m2, rest[0], 1.0 - head_stats["y_mean"],
        )
    else:
        var = np.maximum(m2 - tail_vals**2, 0.0)
    est = Distribution(
        np.asarray(head.values) + tail_vals,
        head.bit_positions, virt.num_clbits,
    )
    if not with_stderr:
        return est
    se2 = var / num_samples
    if head_var is not None:
        se2 = se2 + head_var
    return est, np.sqrt(se2)


def _z_sign_matrix(positions, z_sets, dt):
    """[2^d, num_sets] parity signs over the data bits ``positions``:
    column s at flat index x is ``(-1)^popcount(x & mask_s)`` with bit j
    of x carrying ``positions[j]`` (the :func:`_fold_rows_per_label` /
    knit layout).  Z bits absent from ``positions`` (structurally-zero
    clbits, or bits owned by another fragment) contribute +1."""
    d = len(positions)
    x = np.arange(1 << d, dtype=np.int64)
    cols = []
    for s in z_sets:
        par = np.zeros(1 << d, np.int64)
        for j, p in enumerate(positions):
            if p in s:
                par ^= (x >> j) & 1
        cols.append(1.0 - 2.0 * par)
    return jnp.asarray(np.stack(cols, axis=1), dt)


def _estimate_z(
    virt: VirtualCircuit,
    labels: np.ndarray,
    mass: np.ndarray,
    z_sets,
    second_moment: bool = False,
    dtype=None,
    gamma_override: float | None = None,
    control_stats: bool = False,
    noise=None,
    noise_seed: int = 0,
    collapse=None,
    collapse_seed: int = 0,
    pallas_variant: bool = False,
    mesh=None,
):
    """Core observable estimator: ``[num_sets]`` vector of
    ``sum_l mass[l] * gamma * prod_f <Z_S>_f(l)``.

    The parity sign factorises over the fragments' disjoint clbit sets
    (exactly as in ops/knit.expectation_z, the exact-path twin:
    reference has no observable path at all), so each fragment reduces
    to ONE scalar per (label, z-set) via a single ``rows @ signs``
    matmul — no global distribution of any size materialises, at any
    circuit width.  ``second_moment`` / ``control_stats`` mirror
    :func:`_estimate` (the per-sample square factorises over fragments;
    Y is the signed total mass with exact expectation — for the empty
    z-set X == Y, so the CV is exact there)."""
    gamma_total = (
        sampling_overhead(virt)["gamma_total"]
        if gamma_override is None else float(gamma_override)
    )
    flags = collapse if collapse is not None else \
        [False] * len(virt.fragments)
    lab_np = np.asarray(labels, np.int32)
    mass = np.asarray(mass, np.float64)
    if noise is None and len(lab_np):
        max_w = max(
            virt.programs[r.name].num_data_qubits if flags[fi]
            else virt.programs[r.name].num_sim_qubits
            for fi, r in enumerate(virt.fragments)
        )
        blk = max(1, _label_budget() >> max_w)
        # in-kernel-z route: same block-budget re-evaluation as the
        # marginal kernel (see sampled_knit) — pre-reduced z columns
        # are <= 128 floats/label
        if (pallas_variant and dtype in (None, jnp.float32)):
            eff_w = 1
            ok = True
            for fi, r in enumerate(virt.fragments):
                if not flags[fi]:
                    ok = False
                    break
                w = virt.programs[r.name].num_data_qubits
                if w > 7:
                    if _collapse_row_builder_pallas(
                        virt, r.name, 8, dtype=dtype, z_sets=z_sets,
                    ) is None:
                        ok = False
                        break
                    w = 7
                eff_w = max(eff_w, w)
            if ok:
                blk = max(blk, max(1, _label_budget() >> max(eff_w, 7)))
        if mesh is not None or len(lab_np) > blk:
            return _scan_core(
                virt, lab_np, mass, z_sets=z_sets,
                second_moment=second_moment,
                control_stats=control_stats,
                gamma_override=gamma_override, dtype=dtype,
                flags=flags, collapse_seed=collapse_seed, block=blk,
                pallas_variant=pallas_variant, mesh=mesh,
            )
    lab = jnp.asarray(lab_np)
    prodmat = None
    totals = None
    for fi, reg in enumerate(virt.fragments):
        nm = noise[fi] if noise is not None else None
        if nm is None and flags[fi]:
            built = (
                _collapse_row_builder_pallas(
                    virt, reg.name, int(lab.shape[0]), dtype=dtype
                )
                if pallas_variant else None
            )
            if built is not None:
                fn_p, positions, ns_p, _w = built
                rng = np.random.default_rng(collapse_seed + 7919 * fi)
                u = jnp.asarray(
                    rng.random(
                        (int(lab.shape[0]), max(1, ns_p))
                    ).astype(np.float32)
                )
                rows, positions = fn_p(lab, u)
            else:
                rows, positions = _simulate_label_rows_collapse(
                    virt, reg.name, lab,
                    seed=collapse_seed + 7919 * fi, dtype=dtype,
                )
        else:
            built = (
                _ancilla_row_builder_pallas(
                    virt, reg.name, int(lab.shape[0]), dtype=dtype
                )
                if (pallas_variant and nm is None) else None
            )
            if built is not None:
                rows, positions = built[0](lab, None)
            else:
                if nm is None:
                    rows, positions = _simulate_label_rows(
                        virt, reg.name, lab, dtype=dtype
                    )
                else:
                    rows, positions = _simulate_label_rows_noisy(
                        virt, reg.name, lab_np, nm, seed=noise_seed + fi
                    )
                rows, positions = _fold_rows_per_label(
                    virt, reg.name, rows, lab, positions
                )
        sc = rows @ _z_sign_matrix(positions, z_sets, rows.dtype)
        prodmat = sc if prodmat is None else prodmat * sc
        t = rows.sum(axis=1)
        totals = t if totals is None else totals * t
    dt = prodmat.dtype
    w = jnp.asarray(mass, dt) * gamma_total
    est = np.asarray(w @ prodmat, np.float64)
    if not (second_moment or control_stats):
        return est
    out = [est]
    w2 = jnp.asarray(mass, dt) * (gamma_total * gamma_total)
    if second_moment:
        out.append(np.asarray(w2 @ (prodmat * prodmat), np.float64))
    if control_stats:
        out.append({
            "y_mean": float(jnp.vdot(w, totals)),
            "y2": float(jnp.vdot(w2, totals * totals)),
            "xy": np.asarray(w2 @ (prodmat * totals[:, None]),
                             np.float64),
        })
    return tuple(out)


def sampled_expectation_z(
    virt: VirtualCircuit,
    z_sets,
    num_samples: int,
    seed: int = 0,
    method: str = "iid",
    with_stderr: bool = False,
    control_variate: bool = False,
    dtype=None,
    head_labels: int = 0,
    noise=None,
    noise_seed: int = 0,
    collapse="auto",
    collapse_reps: int | None = None,
    pallas_variant: bool = False,
    mesh=None,
):
    """Unbiased Monte-Carlo estimate of ``<prod_{c in S} Z_c>`` for each
    ``S`` in ``z_sets``, from ``num_samples`` QPD label samples — the
    observable twin of :func:`sampled_knit`, serving the regime neither
    exact path covers: too many cuts to enumerate the label grid AND
    too wide to materialise a distribution (ops/knit.expectation_z
    enumerates every label; streamed_expectation_z scans them all).

    Returns ``[num_sets]`` float64 (plus ``[num_sets]`` stderr when
    ``with_stderr``).  Composes exactly like :func:`sampled_knit`:
    ``method="lhs"`` (balanced labels), ``head_labels`` (exact head +
    conditional tail, stderr scale gamma_tail), bf16 ``dtype``, and
    ``control_variate`` — regression against the signed total mass
    (exact expectation 1; CV4Quantum's home case, arXiv:2502.08735:
    for observables the estimate tracks the total far more tightly
    than any single distribution outcome, so the reduction is larger
    than on knitted distributions).  ``noise`` estimates the NOISY
    observables (see :func:`sampled_knit`); exclusive with bf16."""
    z_sets = [set(s) for s in z_sets]
    noise = _noise_models(virt, noise)
    if noise is not None and dtype is not None:
        raise ValueError("noise and bf16 dtype are exclusive "
                         "(the trajectory-noise path is f32)")
    cflags = _collapse_flags(virt, collapse)
    if noise is not None and any(cflags):
        raise ValueError("collapse mode is exact-path only; fragments "
                         "with noise models cannot collapse")
    if noise is not None and mesh is not None:
        raise ValueError(
            "mesh (dp-sharded sampled scan) and noise are exclusive: "
            "the trajectory-noise path runs single-device, so the mesh "
            "would be silently ignored — drop mesh= or noise="
        )
    ckw = dict(collapse=cflags, pallas_variant=pallas_variant,
               mesh=mesh)
    split = stratified_split(virt, head_labels) if head_labels else None
    if split is None:
        uniq, counts = sample_label_counts(virt, num_samples, seed,
                                           method=method)
        if any(cflags):
            uniq, fc = _expand_measuring_counts(
                virt, uniq, counts.astype(np.float64), cap=collapse_reps
            )
            mass = fc / num_samples
        else:
            mass = counts.astype(np.float64) / num_samples
        if not (with_stderr or control_variate):
            return _estimate_z(virt, uniq, mass, z_sets, dtype=dtype,
                               noise=noise, noise_seed=noise_seed,
                               collapse_seed=seed * 31 + 17, **ckw)
        est, m2, *rest = _estimate_z(
            virt, uniq, mass, z_sets, second_moment=True, dtype=dtype,
            control_stats=control_variate,
            noise=noise, noise_seed=noise_seed,
            collapse_seed=seed * 31 + 17, **ckw,
        )
        if control_variate:
            est, var = _cv_adjust(est, m2, rest[0], 1.0)
        else:
            var = np.maximum(m2 - est**2, 0.0)
        if not with_stderr:
            return est
        return est, np.sqrt(var / num_samples)

    head_rows, head_w, thresh, gamma_head, gamma_tail = split
    head_var = None
    if any(cflags) and (with_stderr or control_variate):
        # collapse-mode head rows are stochastic — replicate-group
        # variance, exactly as in sampled_knit (advisor r4)
        head, head_var, head_stats = _collapse_head_groups(
            virt, head_rows, head_w, collapse_reps or 16,
            lambda rows, w, off: _estimate_z(
                virt, rows, w, z_sets, dtype=dtype, gamma_override=1.0,
                control_stats=control_variate,
                noise=noise, noise_seed=noise_seed,
                collapse_seed=seed * 31 + 29 + off, **ckw,
            ),
            control_variate,
            values=lambda h: h,
            rebuild=lambda _h, v: v,
        )
    else:
        if any(cflags):
            head_rows, head_w = _expand_measuring_mass(
                virt, head_rows, head_w, collapse_reps or 16
            )
        head_out = _estimate_z(
            virt, head_rows, head_w, z_sets, dtype=dtype,
            gamma_override=1.0, control_stats=control_variate,
            noise=noise, noise_seed=noise_seed,
            collapse_seed=seed * 31 + 29, **ckw,
        )
        head, head_stats = head_out if control_variate \
            else (head_out, None)
    if gamma_tail <= 0.0:
        if with_stderr:
            hv = head_var if head_var is not None else np.zeros_like(head)
            return head, np.sqrt(hv)
        return head
    uniq, counts = _sample_tail_counts(virt, num_samples, thresh, seed,
                                       method=method)
    if any(cflags):
        uniq, fc = _expand_measuring_counts(
            virt, uniq, counts.astype(np.float64), cap=collapse_reps
        )
        mass = fc / num_samples
    else:
        mass = counts.astype(np.float64) / num_samples
    if not (with_stderr or control_variate):
        tail = _estimate_z(virt, uniq, mass, z_sets, dtype=dtype,
                           gamma_override=gamma_tail,
                           noise=noise, noise_seed=noise_seed + 503,
                           collapse_seed=seed * 31 + 43, **ckw)
        return head + tail
    tail, m2, *rest = _estimate_z(
        virt, uniq, mass, z_sets, second_moment=True, dtype=dtype,
        gamma_override=gamma_tail, control_stats=control_variate,
        noise=noise, noise_seed=noise_seed + 503,
        collapse_seed=seed * 31 + 43, **ckw,
    )
    # tail sampling variance + the head's collapse-draw variance (None
    # on the exact enumeration path)
    if control_variate:
        tail, var = _cv_adjust(tail, m2, rest[0],
                               1.0 - head_stats["y_mean"])
    else:
        var = np.maximum(m2 - tail**2, 0.0)
    est = head + tail
    if not with_stderr:
        return est
    se2 = var / num_samples
    if head_var is not None:
        se2 = se2 + head_var
    return est, np.sqrt(se2)


def sampled_expectation_z_adaptive(
    virt: VirtualCircuit,
    z_sets,
    eps: float,
    seed: int = 0,
    method: str = "iid",
    control_variate: bool = False,
    dtype=None,
    head_labels: int = 0,
    initial: int = 4096,
    max_samples: int = 2_000_000,
    noise=None,
    noise_seed: int = 0,
    collapse="auto",
    collapse_reps: int | None = None,
    pallas_variant: bool = False,
    mesh=None,
):
    """eps-targeted observable estimation: grow the budget until every
    z-set's EMPIRICAL standard error is <= ``eps`` — the observable twin
    of :func:`sampled_knit_adaptive` (same geometric-growth schedule,
    total work <= 4/3 of the final round's; the Hoeffding budget
    kappa/eps^2 is a worst case the sample's own moments usually beat,
    and ``control_variate`` lowers them further at zero cost).

    Returns ``(estimates [num_sets], stderr [num_sets], samples_used)``;
    caps at ``max_samples`` with a warning like the knit twin."""
    if eps <= 0.0:
        raise ValueError(f"eps must be positive, got {eps}")
    from ..utils.logger import get_logger

    n = max(1, min(int(initial), int(max_samples)))
    round_idx = 0
    while True:
        est, se = sampled_expectation_z(
            virt, z_sets, n, seed=seed + round_idx * 1_000_003,
            method=method, with_stderr=True,
            control_variate=control_variate, dtype=dtype,
            head_labels=head_labels,
            noise=noise, noise_seed=noise_seed + round_idx,
            collapse=collapse, collapse_reps=collapse_reps,
            pallas_variant=pallas_variant, mesh=mesh,
        )
        worst = float(se.max()) if se.size else 0.0
        if worst <= eps or n >= max_samples:
            if worst > eps:
                get_logger(__name__).warning(
                    f"sampled_expectation_z_adaptive: budget exhausted "
                    f"at {n} samples with stderr {worst:.3g} > "
                    f"eps={eps:.3g}"
                )
            return est, se, n
        n = min(int(max_samples),
                max(4 * n, int(n * (worst / eps) ** 2)))
        round_idx += 1
