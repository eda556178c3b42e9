"""Whole-variant-in-VMEM Pallas kernel (ops/pallas_variant.py) — exact
differential against the XLA batched engine, interpret mode on CPU (the
Mosaic path itself is TPU-only and opt-in; perf is probed by
benchmarks/pallas_variant_probe.py)."""
import numpy as np
import pytest

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (
    Circuit,
    Instruction,
    Register,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (
    make_pallas_variant_fn,
    run_fragment_pallas_variant,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
    run_fragment,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
    VirtualCircuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (
    VirtualGateOp,
)


def _chain_cut(nbig: int):
    cut = Circuit([Register("frag0", nbig), Register("frag1", 2)],
                  nbig + 2)
    cut.h(0)
    for i in range(nbig - 1):
        cut.cx(i, i + 1)
    for q in range(nbig):
        cut.rz(0.1 * (q + 1), q)
    cut.append(Instruction("vgate", [nbig - 1, nbig],
                           op=VirtualGateOp("cz")))
    cut.append(Instruction("vgate", [0, nbig],
                           op=VirtualGateOp("cp", params=(0.7,))))
    cut.cx(nbig, nbig + 1)
    for q in range(nbig + 2):
        cut.measure(q, q)
    return VirtualCircuit(cut)


def test_chain_fragment_rows_exact():
    """Covers: fixed 1q/2q gates on lane and row bits, two slot kinds
    (measuring cz + parameterised cp), deferral ancillas."""
    virt = _chain_cut(8)
    got = run_fragment_pallas_variant(virt, "frag0", interpret=True)
    want = run_fragment(virt, "frag0")
    assert got.bit_positions == want.bit_positions
    np.testing.assert_allclose(
        np.asarray(got.values), np.asarray(want.values), atol=2e-6
    )


def test_sup12_fragment_rows_exact():
    """A real optimal-cut supremacy fragment (dense 2q structure, cz
    cuts on interior qubits)."""
    circ = genCirc("sup", 12, 1, seed=5)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=10,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    for reg in virt.fragments:
        got = run_fragment_pallas_variant(virt, reg.name, interpret=True)
        if got is None:
            continue  # below the kernel's 8-qubit floor
        want = run_fragment(virt, reg.name)
        np.testing.assert_allclose(
            np.asarray(got.values), np.asarray(want.values), atol=2e-6
        )


def test_width_gate():
    """Fragments outside [8, 19] sim qubits are declined, not wrong."""
    virt = _chain_cut(8)
    assert make_pallas_variant_fn(virt, "frag1", interpret=True) is None


def test_streamed_engine_with_pallas_rows_matches():
    """engine='pallas' route: the streamed scan with the VMEM kernel as
    the per-chunk row producer must equal the plain streamed scan."""
    import jax

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    virt = _chain_cut(8)
    s1, xs1, _ = make_streamed_knit(virt, chunk=18)
    s2, xs2, _ = make_streamed_knit(virt, chunk=18, pallas_variant=True)
    a = np.asarray(jax.jit(s1)(xs1))
    b = np.asarray(jax.jit(s2)(xs2))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_run_virtual_circuit_engine_pallas():
    """The public engine='pallas' route (CPU: interpret mode) matches the
    default engine and the uncut oracle."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (
        simulate_circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    circ = genCirc("ghz", 10, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=5,
                    maxNQpdCuts=2, maxNCuts=2)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    dist, _ = run_virtual_circuit(virt, engine="pallas", chunk_size=12)
    assert hellinger_fidelity(simulate_circuit(circ), dist) > 1 - 1e-6


def _qft_gamma_cut(n: int, q: int):
    circ = genCirc("qft", n, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=q,
                    gammaMode=True, maxNQpdCuts=20, maxNCuts=20,
                    maxCutsPerPartitions=20)
    assert cutter.solve()
    return circ, VirtualCircuit(cutter.getResultCircs()[3])


def test_collapse_builder_rows_exact():
    """Collapse-mode kernel (in-kernel mid-circuit measure-and-collapse)
    vs the XLA collapse builder: same labels + same uniform draws must
    give the SAME branch picks and fold weights, so rows match to float
    tolerance (qft-9 gamma-mode cut: 8 collapse sites on a 2^8 data
    state)."""
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _collapse_row_builder,
        _collapse_row_builder_pallas,
        sample_label_counts,
    )

    _, virt = _qft_gamma_cut(9, 8)
    frag = next(
        r.name for r in virt.fragments
        if virt.programs[r.name].num_data_qubits >= 8
    )
    uniq, _counts = sample_label_counts(virt, 64, 3)
    L = 16
    lab = np.asarray(uniq[:L], np.int32)
    if len(lab) < L:
        lab = np.concatenate([lab, np.repeat(lab[-1:], L - len(lab), 0)])
    fx, posx, nsx, _ = _collapse_row_builder(virt, frag)
    built = _collapse_row_builder_pallas(virt, frag, L)
    assert built is not None
    fp, posp, nsp, _ = built
    assert posx == posp and nsx == nsp
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random((L, max(1, nsx))).astype(np.float32))
    rx, _ = fx(jnp.asarray(lab), u)
    rp, _ = fp(jnp.asarray(lab), u)
    np.testing.assert_allclose(
        np.asarray(rp), np.asarray(rx), atol=2e-6
    )


def test_scan_core_pallas_variant_matches_xla():
    """The blocked sampled scan with pallas_variant=True (kernel rows,
    interpret mode on CPU) must equal the XLA scan bit-for-bit in
    expectation machinery: same collapse_seed -> same draws -> identical
    estimates, for both the distribution and the z-observable paths."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _collapse_row_builder_pallas,
        _scan_core,
        sample_label_counts,
    )

    _, virt = _qft_gamma_cut(9, 8)
    # force collapse on every fragment (auto keeps the ancilla path at
    # this CPU scale); the kernel takes the wide fragment, the narrow
    # one falls back to the XLA builder — both routes exercised
    flags = [True] * len(virt.fragments)
    assert any(
        _collapse_row_builder_pallas(virt, r.name, 32) is not None
        for r in virt.fragments
    )
    uniq, counts = sample_label_counts(virt, 1000, 5)
    mass = counts.astype(np.float64) / 1000
    a = _scan_core(virt, uniq, mass, flags=flags, collapse_seed=11,
                   block=32)
    b = _scan_core(virt, uniq, mass, flags=flags, collapse_seed=11,
                   block=32, pallas_variant=True)
    np.testing.assert_allclose(
        np.asarray(b.values), np.asarray(a.values), atol=1e-7
    )
    za = _scan_core(virt, uniq, mass, z_sets=[[0], [0, 1, 2]],
                    flags=flags, collapse_seed=11, block=32)
    zb = _scan_core(virt, uniq, mass, z_sets=[[0], [0, 1, 2]],
                    flags=flags, collapse_seed=11, block=32,
                    pallas_variant=True)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(za), atol=1e-7)


def test_sampled_knit_pallas_variant_accuracy():
    """Public surface: sampled_knit(pallas_variant=True) on a collapse-
    mode qft cut estimates the exact marginal within its own stderr
    envelope (the flag only swaps the row producer)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
        lightcone_marginal,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        sampled_knit,
    )

    circ, virt = _qft_gamma_cut(9, 8)
    keep = {0, 1}
    est, stderr = sampled_knit(
        virt, 4000, seed=2, keep_clbits=keep, with_stderr=True,
        method="lhs", control_variate=True,
        collapse=[virt.programs[r.name].num_data_qubits >= 8
                  for r in virt.fragments],
        pallas_variant=True,
    )
    oracle = lightcone_marginal(circ, keep)
    err = np.max(np.abs(
        np.asarray(est.values, np.float64)
        - np.asarray(oracle.values, np.float64)
    ))
    bound = 5.0 * max(float(np.max(stderr)), 1e-3)
    assert err < bound, (err, bound)


def test_run_virtual_circuit_sample_pallas():
    """Public engine='sampled' + sample_pallas=True route (CPU:
    interpret mode) estimates the exact marginal; the knob is rejected
    on non-sampled engines."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.lightcone import (
        lightcone_marginal,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (
        run_virtual_circuit,
    )

    circ, virt = _qft_gamma_cut(9, 8)
    dist, _info = run_virtual_circuit(
        virt, shots=6000, engine="sampled", sample_method="lhs",
        sample_cv=True, keep_clbits={0, 1}, sample_pallas=True,
        project=False,
    )
    oracle = lightcone_marginal(circ, {0, 1})
    err = np.max(np.abs(
        np.asarray(dist.values, np.float64)
        - np.asarray(oracle.values, np.float64)
    ))
    assert err < 0.05, err
    with pytest.raises(ValueError, match="sample_pallas"):
        run_virtual_circuit(virt, engine="streamed", sample_pallas=True)


def test_scan_step_cache_reuse():
    """Repeat sampled estimates on the same VirtualCircuit reuse the
    cached jitted scan step (nb-bucketed key): same-bucket second call
    adds no cache entry and returns the identical estimate (same seed
    -> same draws)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _scan_core,
        sample_label_counts,
    )

    _, virt = _qft_gamma_cut(9, 8)
    flags = [True] * len(virt.fragments)
    uniq, counts = sample_label_counts(virt, 800, 5)
    mass = counts.astype(np.float64) / 800
    a = _scan_core(virt, uniq, mass, flags=flags, collapse_seed=3,
                   block=32)
    assert len(virt._scan_step_cache) == 1
    b = _scan_core(virt, uniq, mass, flags=flags, collapse_seed=3,
                   block=32)
    assert len(virt._scan_step_cache) == 1
    np.testing.assert_allclose(
        np.asarray(b.values), np.asarray(a.values), atol=0
    )
    # different stats config -> a second entry, not a collision
    _scan_core(virt, uniq, mass, flags=flags, collapse_seed=3,
               block=32, second_moment=True)
    assert len(virt._scan_step_cache) == 2


def test_scan_core_ancilla_pallas_matches_xla():
    """Exact (ancilla-mode) sampled rows through the kernel
    (_ancilla_row_builder_pallas): flags all-False + pallas_variant=True
    must equal the XLA scan exactly (deterministic path — no draws)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _scan_core,
        sample_label_counts,
    )

    _, virt = _qft_gamma_cut(9, 8)
    flags = [False] * len(virt.fragments)
    uniq, counts = sample_label_counts(virt, 400, 5)
    mass = counts.astype(np.float64) / 400
    a = _scan_core(virt, uniq, mass, flags=flags, block=16)
    b = _scan_core(virt, uniq, mass, flags=flags, block=16,
                   pallas_variant=True)
    np.testing.assert_allclose(
        np.asarray(b.values), np.asarray(a.values), atol=1e-6
    )


def test_collapse_kernel_wire_cut():
    """VirtualMove (wire cut, 8 variants) through the collapse kernel:
    the measuring endpoint carries a collapse site, the prep endpoint
    has none — both fragments' kernel rows must equal the XLA builder's
    exactly."""
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _collapse_row_builder,
        _collapse_row_builder_pallas,
        sample_label_counts,
    )

    circ = genCirc("ghz", 18, 1)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=10,
                    forceNWireCuts=1, maxNQpdCuts=3, maxNCuts=3)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    uniq, _ = sample_label_counts(virt, 64, 3)
    L = 16
    lab = np.asarray(
        np.concatenate([uniq] * (1 + L // max(1, len(uniq))))[:L],
        np.int32,
    )
    hit = 0
    for reg in virt.fragments:
        if virt.programs[reg.name].num_data_qubits < 8:
            continue
        fx, posx, nsx, _ = _collapse_row_builder(virt, reg.name)
        built = _collapse_row_builder_pallas(virt, reg.name, L)
        assert built is not None
        fp, posp, nsp, _ = built
        assert (posx, nsx) == (posp, nsp)
        rng = np.random.default_rng(7)
        u = jnp.asarray(rng.random((L, max(1, nsx))).astype(np.float32))
        rx, _ = fx(jnp.asarray(lab), u)
        rp, _ = fp(jnp.asarray(lab), u)
        np.testing.assert_allclose(
            np.asarray(rp), np.asarray(rx), atol=2e-6
        )
        hit += 1
    assert hit == 2  # both endpoints exercised the kernel


def test_collapse_kernel_label_batching_exact():
    """The label-batched kernel (batch > 1 labels stacked on the high
    row bits) must reproduce the unbatched kernel and the XLA builder
    exactly — same labels, same draws, same rows."""
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (
        _build_call_collapse,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _collapse_row_builder,
        _collapse_row_builder_pallas,
        sample_label_counts,
    )

    _, virt = _qft_gamma_cut(9, 8)
    frag = next(
        r.name for r in virt.fragments
        if virt.programs[r.name].num_data_qubits >= 8
    )
    # auto-batch engages: chunk 16 at n=8 -> batch 16 (8+4 <= 20)
    built = _build_call_collapse(virt, frag, 16, interpret=True,
                                 batch=16)
    assert built is not None
    uniq, _ = sample_label_counts(virt, 64, 3)
    lab = np.asarray(uniq[:16], np.int32)
    if len(lab) < 16:
        lab = np.concatenate(
            [lab, np.repeat(lab[-1:], 16 - len(lab), 0)]
        )
    fx, posx, nsx, _ = _collapse_row_builder(virt, frag)
    fp, posp, nsp, _ = _collapse_row_builder_pallas(virt, frag, 16)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random((16, max(1, nsx))).astype(np.float32))
    rx, _ = fx(jnp.asarray(lab), u)
    rp, _ = fp(jnp.asarray(lab), u)
    np.testing.assert_allclose(np.asarray(rp), np.asarray(rx),
                               atol=2e-6)
    # mixed batch divisors must also agree with each other
    with pytest.raises(ValueError):
        _build_call_collapse(virt, frag, 16, interpret=True, batch=3)


def test_collapse_kernel_in_kernel_marginal_exact():
    """keep_clbits kernel mode: rows come back already marginalised
    (masked in-kernel reductions, <= 128 output lanes) and must equal
    the full-rows route composed with _marginalize_rows exactly —
    positions, column order and values."""
    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
        _collapse_row_builder,
        _collapse_row_builder_pallas,
        _marginalize_rows,
        sample_label_counts,
    )

    _, virt = _qft_gamma_cut(9, 8)
    frag = next(
        r.name for r in virt.fragments
        if virt.programs[r.name].num_data_qubits >= 8
    )
    uniq, _ = sample_label_counts(virt, 64, 3)
    lab = np.asarray(uniq[:16], np.int32)
    if len(lab) < 16:
        lab = np.concatenate(
            [lab, np.repeat(lab[-1:], 16 - len(lab), 0)]
        )
    fx, posx, nsx, _ = _collapse_row_builder(virt, frag)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.random((16, max(1, nsx))).astype(np.float32))
    rx, _ = fx(jnp.asarray(lab), u)
    for keep in ([0], [0, 2], [1, 3, 5], list(range(6))):
        keep_in_frag = [p for p in posx if p in set(keep)]
        want, wpos = _marginalize_rows(rx, list(posx), set(keep))
        built = _collapse_row_builder_pallas(
            virt, frag, 16, keep_clbits=set(keep)
        )
        assert built is not None
        fm, posm, nsm, _ = built
        assert list(posm) == list(wpos) == keep_in_frag
        rm, _ = fm(jnp.asarray(lab), u)
        np.testing.assert_allclose(np.asarray(rm), np.asarray(want),
                                   atol=2e-6)


def test_sampled_knit_marginal_kernel_block_raise(monkeypatch):
    """Public route: with pallas_variant + keep_clbits the sampled scan
    re-evaluates its block budget at the in-kernel-marginal width (128
    lanes/label) — a tiny forced budget routes BOTH engines through the
    scan at different blocks, and the estimates must still agree (same
    seeds -> same draws -> same picks)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops import (
        qpd_sampling as qs,
    )

    _, virt = _qft_gamma_cut(9, 8)
    keep = [0, 1, 2]
    args = dict(seed=2, keep_clbits=keep, with_stderr=True,
                method="lhs", control_variate=True, collapse=True)
    monkeypatch.setattr(qs, "_label_budget", lambda: 1 << 9)
    e0, s0 = qs.sampled_knit(virt, 4000, **args)
    e1, s1 = qs.sampled_knit(virt, 4000, pallas_variant=True, **args)
    np.testing.assert_allclose(
        np.asarray(e1.values), np.asarray(e0.values),
        atol=5e-5, rtol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s0), atol=5e-5, rtol=1e-2,
    )


def test_sampled_z_kernel_pre_reduced(monkeypatch):
    """In-kernel Z-observable mode: the kernel returns pre-reduced
    signed columns (+ total) and the scan skips its sign-matrix matmul;
    estimates, stderr and control-variate stats must match the XLA
    route (same seeds -> same draws)."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops import (
        qpd_sampling as qs,
    )

    _, virt = _qft_gamma_cut(9, 8)
    flags = [True] * len(virt.fragments)
    # builder marks itself pre-reduced
    b = qs._collapse_row_builder_pallas(
        virt, next(r.name for r in virt.fragments
                   if virt.programs[r.name].num_data_qubits >= 8),
        16, z_sets=[{0}, {1, 2}],
    )
    assert b is not None and getattr(b[0], "z_pre", False)
    uniq, counts = qs.sample_label_counts(virt, 1000, 5)
    mass = counts.astype(np.float64) / 1000
    zs = [[0], [0, 1, 2], [4], list(range(9))]
    a = qs._scan_core(virt, uniq, mass, z_sets=zs, flags=flags,
                      collapse_seed=11, block=32,
                      second_moment=True, control_stats=True)
    b2 = qs._scan_core(virt, uniq, mass, z_sets=zs, flags=flags,
                       collapse_seed=11, block=32,
                       second_moment=True, control_stats=True,
                       pallas_variant=True)
    import jax

    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b2)):
        np.testing.assert_allclose(
            np.asarray(y, np.float64), np.asarray(x, np.float64),
            atol=1e-4, rtol=1e-4,
        )
    # public route with the z block-budget raise engaged
    zsets = [{0}, {0, 1, 2}, set(range(9))]
    monkeypatch.setattr(qs, "_label_budget", lambda: 1 << 9)
    z0, t0 = qs.sampled_expectation_z(
        virt, zsets, 4000, seed=2, method="lhs", with_stderr=True,
        control_variate=True, collapse=True,
    )
    z1, t1 = qs.sampled_expectation_z(
        virt, zsets, 4000, seed=2, method="lhs", with_stderr=True,
        control_variate=True, collapse=True, pallas_variant=True,
    )
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               atol=1e-4, rtol=1e-2)


# ---------------------------------------------------------------------------
# r5: fold-fused kernel (VERDICT r4 #3 — fold/knit epilogue in-kernel)
# ---------------------------------------------------------------------------

def _hwe_cut(n=16, depth=3, cap=10):
    circ = genCirc("hwe", n, depth)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=cap,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    return VirtualCircuit(cutter.getResultCircs()[3])


def test_folded_kernel_rows_match_xla_fold():
    """make_folded_chunk_kernel's in-kernel fold must equal the XLA
    rows + fold_plans path elementwise (dense, marginal and z modes),
    through the full streamed engine."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (  # noqa: E501
        run_virtual_circuit_streamed,
        streamed_expectation_z,
    )

    virt = _hwe_cut()
    d_x = run_virtual_circuit_streamed(virt, chunk=64)
    d_p = run_virtual_circuit_streamed(virt, chunk=64,
                                       pallas_variant=True)
    np.testing.assert_allclose(
        np.asarray(d_p.values), np.asarray(d_x.values), atol=1e-6
    )
    m_x = run_virtual_circuit_streamed(virt, chunk=64,
                                       keep_clbits=[0, 1, 2])
    m_p = run_virtual_circuit_streamed(virt, chunk=64,
                                       keep_clbits=[0, 1, 2],
                                       pallas_variant=True)
    assert m_p.bit_positions == m_x.bit_positions
    np.testing.assert_allclose(
        np.asarray(m_p.values), np.asarray(m_x.values), atol=1e-6
    )
    zc = sorted({
        c for p in virt.programs.values() for c in p.clbit_sources
        if c < virt.num_clbits
    })[:3]
    z_x = streamed_expectation_z(virt, zc)
    z_p = streamed_expectation_z(virt, zc, pallas_variant=True)
    assert abs(z_x - z_p) < 1e-6


def test_folded_kernel_small_keep_masked_lane_path():
    """d_keep <= 7 routes through the masked-lane reduction epilogue —
    must match the XLA marginal exactly."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (  # noqa: E501
        make_folded_chunk_kernel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (  # noqa: E501
        run_virtual_circuit_streamed,
    )

    virt = _hwe_cut()
    name = virt.fragments[0].name
    built = make_folded_chunk_kernel(virt, name, 16, interpret=True,
                                     keep_clbits=[0])
    assert built is not None
    rows_fn, kept = built
    assert len(kept) <= 1
    m_x = run_virtual_circuit_streamed(virt, chunk=64, keep_clbits=[0])
    m_p = run_virtual_circuit_streamed(virt, chunk=64, keep_clbits=[0],
                                       pallas_variant=True)
    np.testing.assert_allclose(
        np.asarray(m_p.values), np.asarray(m_x.values), atol=1e-6
    )


def test_folded_kernel_engine_pallas_end_to_end():
    """engine='pallas' through run_virtual_circuit now uses the
    fold-fused kernel; fidelity 1 vs the uncut oracle."""
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E501
        hellinger_fidelity,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E501
        simulate_circuit_host,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E501
        run_virtual_circuit,
    )

    circ = genCirc("hwe", 16, 3)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=10,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    dist, _ = run_virtual_circuit(virt, engine="pallas")
    fid = hellinger_fidelity(simulate_circuit_host(circ), dist)
    assert fid > 1 - 1e-6


def test_folded_kernel_staged_matches_unstaged_any_order():
    """r5 staged checkpoint layout (VMEM per-slot checkpoints, resume
    from the first changed slot): must be EXACT for arbitrary label
    order — the stage array derives from consecutive-row diffs inside
    rows_fn, so ordering is only a perf hint — and across chunk
    boundaries (checkpoints never leak between pallas_call invocations;
    row 0 of every chunk replays in full)."""
    import math

    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (  # noqa: E501
        make_folded_chunk_kernel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (  # noqa: E501
        label_strides,
        variant_index_table,
    )

    virt = _chain_cut(8)
    name = "frag0"
    specs = [vg.spec for vg in virt.vgates]
    strides, n_inst, total = label_strides(specs, range(len(specs)))
    chunk = 8
    padded = math.ceil(total / chunk) * chunk
    vidx = np.asarray(variant_index_table(
        range(len(specs)), strides, n_inst, padded, clamp_to=total
    ))
    rng = np.random.default_rng(7)
    shuf = vidx[
        list(rng.permutation(total)) + list(range(total, padded))
    ]
    b_s = make_folded_chunk_kernel(virt, name, chunk, interpret=True)
    b_u = make_folded_chunk_kernel(virt, name, chunk, interpret=True,
                                   staged=False)
    assert b_s is not None and b_u is not None
    rows_s, kept_s = b_s
    rows_u, kept_u = b_u
    assert kept_s == kept_u
    for arr in (vidx, shuf):
        for c0 in range(0, padded, chunk):
            blk = jnp.asarray(arr[c0:c0 + chunk])
            np.testing.assert_allclose(
                np.asarray(rows_s(blk)), np.asarray(rows_u(blk)),
                atol=1e-6,
            )


def test_chunk_kernel_staged_matches_unstaged():
    """The non-folded chunk kernel (marginalised full-width rows, the
    fallback when in-kernel folding does not apply) with staged
    checkpoints must equal its unstaged twin on shuffled label order."""
    import math

    import jax.numpy as jnp

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (  # noqa: E501
        make_chunk_kernel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (  # noqa: E501
        label_strides,
        variant_index_table,
    )

    virt = _chain_cut(8)
    name = "frag0"
    specs = [vg.spec for vg in virt.vgates]
    strides, n_inst, total = label_strides(specs, range(len(specs)))
    chunk = 8
    padded = math.ceil(total / chunk) * chunk
    vidx = np.asarray(variant_index_table(
        range(len(specs)), strides, n_inst, padded, clamp_to=total
    ))
    shuf = vidx[
        list(np.random.default_rng(3).permutation(total))
        + list(range(total, padded))
    ]
    b_s = make_chunk_kernel(virt, name, chunk, interpret=True)
    b_u = make_chunk_kernel(virt, name, chunk, interpret=True,
                            staged=False)
    assert b_s is not None and b_u is not None
    rows_s, pos_s = b_s
    rows_u, pos_u = b_u
    assert pos_s == pos_u
    for c0 in range(0, padded, chunk):
        blk = jnp.asarray(shuf[c0:c0 + chunk])
        np.testing.assert_allclose(
            np.asarray(rows_s(blk)), np.asarray(rows_u(blk)),
            atol=1e-6,
        )
