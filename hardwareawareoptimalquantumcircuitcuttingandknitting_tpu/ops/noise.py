"""Noise models: the stand-in for the reference's qiskit fake backends
(FakeKolkataV2 / FakeAthens / FakeOpenPulse2Q-3Q — benchmark.py:5,95,
benchmark_different_backends.py:5,20-22).

Model: per-gate depolarising noise simulated by Pauli-twirl trajectories
(each trajectory inserts one sampled Pauli per physical gate site; the
trajectory axis is vmapped, so the whole noisy ensemble is one XLA launch),
plus exact readout-error application on the final probability vector (a per
-bit 2x2 stochastic matrix contraction — deterministic, no sampling needed).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..circuit.circuit import Circuit
from ..circuit.gates import I2, X, Y, Z
from ..virt.virtual_circuit import VirtualCircuit
from .statevector import (
    Distribution,
    apply_matrix,
    compile_circuit,
    marginalize_flat,
    to_real_block,
)
from .variant_engine import FragmentResult, make_sim_fn

_PAULI_BLOCKS = np.stack([to_real_block(m) for m in (I2, X, Y, Z)])


@dataclass
class NoiseModel:
    """Depolarising + readout error device model."""

    name: str = "generic"
    p1: float = 0.0005          # 1q gate depolarising probability
    p2: float = 0.01            # 2q gate depolarising probability
    readout01: float = 0.015    # P(read 1 | actual 0)
    readout10: float = 0.03     # P(read 0 | actual 1)
    trajectories: int = 16
    num_qubits: int | None = None  # capacity, for per-fragment mapping


def default_noise_model() -> NoiseModel:
    """FakeKolkataV2-flavoured parameters (27-qubit device class)."""
    return NoiseModel(name="fake_kolkata", num_qubits=27)


def fake_athens() -> NoiseModel:
    return NoiseModel("fake_athens", 0.0004, 0.012, 0.02, 0.035, num_qubits=5)


def fake_open_pulse(n: int) -> NoiseModel:
    return NoiseModel(f"fake_openpulse{n}q", 0.001, 0.02, 0.03, 0.05,
                      num_qubits=n)


def _sample_paulis(rng: np.random.Generator, probs, shape):
    """probs: per-site depolarising probability list [S]; returns real
    blocks [S, *shape, 2, 2, 2, 2]."""
    out = []
    for p in probs:
        idx = rng.choice(
            4, size=shape, p=[1 - p, p / 3, p / 3, p / 3]
        )
        out.append(_PAULI_BLOCKS[idx])
    return out


def apply_readout_error(dist: Distribution, nm: NoiseModel) -> Distribution:
    """Exact readout-error channel on the written bits."""
    k = len(dist.bit_positions)
    if k == 0:
        return dist
    m = np.array(
        [[1 - nm.readout01, nm.readout10], [nm.readout01, 1 - nm.readout10]],
        dtype=np.float32,
    )
    vals = jnp.asarray(dist.values).reshape((2,) * k)
    for axis in range(k):
        vals = jnp.tensordot(jnp.asarray(m), vals, axes=([1], [axis]))
        vals = jnp.moveaxis(vals, 0, axis)
    return Distribution(
        np.asarray(vals.reshape(-1)), dist.bit_positions, dist.num_clbits
    )


def simulate_noisy_circuit(
    circ: Circuit,
    nm: NoiseModel,
    shots: int | None = None,
    seed: int = 0,
) -> Distribution:
    """Uncut-circuit noisy simulation (the reference's
    ``backend.run(circuit)`` on a fake backend, Utilities.py:39-69)."""
    compiled = compile_circuit(circ)
    n = compiled.num_sim_qubits
    rng = np.random.default_rng(seed)

    # noise sites: every compiled op that is a physical gate.  compile_circuit
    # flattens measure/reset bookkeeping into CX/SWAP ops indistinguishable
    # here, so noise is charged on every op — acceptable for a device model
    # whose measurement is noisy anyway.
    probs = [
        nm.p1 if len(axes) == 1 else nm.p2 for _, axes in compiled.ops
    ]
    site_qubit = [axes[0] for _, axes in compiled.ops]
    k_traj = nm.trajectories
    pauli = _sample_paulis(rng, probs, (k_traj,))  # list of [K,2,2,2,2]

    blocks = [(to_real_block(u), axes) for u, axes in compiled.ops]

    def sim_traj(pauli_mats):
        state = jnp.zeros((2, 1 << n), dtype=jnp.float32)
        state = state.at[0, 0].set(1.0)
        for i, (b, axes) in enumerate(blocks):
            state = apply_matrix(state, b, axes, n)
            state = apply_matrix(state, pauli_mats[i], (site_qubit[i],), n)
        return jnp.sum(state * state, axis=0)

    if not blocks:
        probs_vec = sim_traj([])
    else:
        probs_vec = jnp.mean(jax.vmap(sim_traj)(pauli), axis=0)

    positions = sorted(compiled.clbit_sources)
    sources = [compiled.clbit_sources[c] for c in positions]
    p = marginalize_flat(probs_vec, n, sources)
    dist = Distribution(np.asarray(p), positions, compiled.num_clbits)
    dist = apply_readout_error(dist, nm)
    if shots is not None:
        from .sampling import sample_fragment_results

        res = FragmentResult("uncut", dist.values[None, :],
                             dist.bit_positions, [])
        res = sample_fragment_results([res], shots, seed)[0]
        dist = Distribution(res.values[0], dist.bit_positions,
                            dist.num_clbits)
    return dist


def run_fragment_noisy(
    virt: VirtualCircuit,
    frag_name: str,
    nm: NoiseModel,
    seed: int = 0,
    chunk_size: int = 256,
) -> FragmentResult:
    """Noisy fragment execution: variants x trajectories batched in one
    vmapped program, averaged over the trajectory axis."""
    import math

    sim_one, slot_mats, positions, flat_count = make_sim_fn(
        virt, frag_name, noise=nm
    )
    rng = np.random.default_rng(seed)
    k_traj = nm.trajectories
    width = max(1, 2 ** len(positions))
    prog = virt.programs[frag_name]

    site_probs = [p for (_, _, p) in sim_one.noise_sites]

    if not prog.slots:
        pauli = _sample_paulis(rng, site_probs, (k_traj,))
        rows = jax.vmap(lambda pm: sim_one([], pm))(pauli)
        row = jnp.mean(rows, axis=0)
        values = np.broadcast_to(np.asarray(row), (flat_count, width)).copy()
        return FragmentResult(
            frag_name, values, positions, list(prog.touching)
        )

    # batch = variants x trajectories
    total = flat_count * k_traj
    v_idx = np.repeat(np.arange(flat_count), k_traj)
    batched_slots = [
        tuple(np.asarray(m)[v_idx] for m in mats) for mats in slot_mats
    ]
    pauli = _sample_paulis(rng, site_probs, (total,))

    sim_batch = jax.jit(jax.vmap(sim_one))
    chunk = min(chunk_size, total)
    n_chunks = math.ceil(total / chunk)
    padded = n_chunks * chunk
    if padded != total:
        batched_slots = [
            tuple(
                np.concatenate([m, np.repeat(m[-1:], padded - total, 0)])
                for m in mats
            )
            for mats in batched_slots
        ]
        pauli = [
            np.concatenate([p, np.repeat(p[-1:], padded - total, 0)])
            for p in pauli
        ]
    rows = []
    for i in range(n_chunks):
        sl = slice(i * chunk, (i + 1) * chunk)
        rows.append(
            np.asarray(
                sim_batch(
                    [tuple(m[sl] for m in mats) for mats in batched_slots],
                    [p[sl] for p in pauli],
                )
            )
        )
    values = np.concatenate(rows, axis=0)[:total]
    values = values.reshape(flat_count, k_traj, width).mean(axis=1)
    return FragmentResult(frag_name, values, positions, list(prog.touching))


def run_noisy_virtual_circuit(
    virt: VirtualCircuit,
    noise=None,
    shots: int | None = None,
    seed: int = 0,
    engine: str = "auto",
    chunk_size: int = 512,
    checkpoint_dir=None,
):
    """Noisy analog of run_virtual_circuit.  ``noise`` is one NoiseModel for
    all fragments, a list mapping fragment i -> NoiseModel (the
    heterogeneous-backend path, Utilities.py:106-150 /
    benchmark_different_backends.py), or None to use the per-fragment
    mapping set via ``virt.set_backend`` (virtual_circuit.py:82-95); a
    fragment whose backend is None runs on the exact ideal engine.

    ``engine="streamed"`` runs the constant-memory scan with trajectory
    noise + readout fused into the body (ops/streamed.py) — the path for
    fan-outs too big to materialise (sup-20/25, aqft), shot-sampled and
    checkpointable like the exact streamed engine."""
    from ..run import RunTimeInfo
    from .knit import knit, nearest_probability_distribution
    from .variant_engine import run_fragment

    import time

    if noise is None:
        models = [virt.get_backend(reg.name) for reg in virt.fragments]
    elif isinstance(noise, (list, tuple)):
        models = list(noise)
    else:
        models = [noise] * len(virt.fragments)
    assert len(models) >= len(virt.fragments)

    if engine == "streamed":
        from .streamed import run_virtual_circuit_streamed

        for i, reg in enumerate(virt.fragments):
            nm = models[i]
            if nm is not None and nm.num_qubits is not None:
                assert (
                    virt.programs[reg.name].num_data_qubits <= nm.num_qubits
                ), f"fragment {reg.name} does not fit backend {nm.name}"
        now = time.perf_counter()
        dist = run_virtual_circuit_streamed(
            virt, chunk=chunk_size, project=True,
            noise=models[: len(virt.fragments)],
            shots=shots, seed=seed, checkpoint_dir=checkpoint_dir,
        )
        return dist, RunTimeInfo(time.perf_counter() - now, 0.0)
    now = time.perf_counter()
    results = []
    for i, reg in enumerate(virt.fragments):
        nm = models[i]
        if nm is None:
            results.append(run_fragment(virt, reg.name))
            continue
        if nm.num_qubits is not None:
            assert virt.programs[reg.name].num_data_qubits <= nm.num_qubits, (
                f"fragment {reg.name} does not fit backend {nm.name}"
            )
        res = run_fragment_noisy(virt, reg.name, nm, seed=seed + i)
        # readout error on this fragment's written bits (incl. vgate clbits),
        # applied to every variant row at once
        k = len(res.bit_positions)
        if k:
            m = np.array(
                [
                    [1 - nm.readout01, nm.readout10],
                    [nm.readout01, 1 - nm.readout10],
                ],
                dtype=np.float32,
            )
            vals = res.values.reshape((res.values.shape[0],) + (2,) * k)
            for axis in range(1, k + 1):
                vals = np.moveaxis(
                    np.tensordot(m, vals, axes=([1], [axis])), 0, axis
                )
            res = FragmentResult(
                res.name,
                vals.reshape(res.values.shape[0], -1),
                res.bit_positions,
                res.touching,
            )
        results.append(res)
    if shots is not None:
        from .sampling import sample_fragment_results

        results = sample_fragment_results(results, shots, seed)
    run_time = time.perf_counter() - now
    now = time.perf_counter()
    dist = knit(virt, results)
    knit_time = time.perf_counter() - now
    dist = nearest_probability_distribution(dist)
    return dist, RunTimeInfo(run_time, knit_time)
