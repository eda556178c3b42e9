"""Compile-time bisection probe for the tunneled TPU backend.

    python -m hardwareawareoptimalquantumcircuitcuttingandknitting_tpu._compile_probe \
        --mode oracle --n 24

Modes: oracle (uncut GHZ-n sim -> scalar), oracle-nomarg (skip the
marginal/reorder), frags (fragment variant sims -> scalars),
knit (fragment sims + knit contraction -> scalar).
"""
from __future__ import annotations

import argparse
import sys
import time

_T0 = time.perf_counter()


def _phase(msg):
    print(f"[probe +{time.perf_counter() - _T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="oracle")
    ap.add_argument("--n", type=int, default=24)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from .utils.jaxcache import enable_cache

    enable_cache()
    jnp.zeros((8,)).block_until_ready()
    _phase(f"backend up: {jax.devices()[0]}")

    from .models.zoo import genCirc
    from .ops.statevector import (
        compile_circuit, to_real_block, apply_matrix, marginalize_flat,
    )

    circ = genCirc("ghz", args.n, 1)

    if args.mode in ("oracle", "oracle-nomarg"):
        uncut = compile_circuit(circ)
        blocks = [(to_real_block(u), ax) for u, ax in uncut.ops]
        positions = sorted(uncut.clbit_sources)
        sources = [uncut.clbit_sources[c] for c in positions]
        n = uncut.num_sim_qubits
        with_marg = args.mode == "oracle"

        def fn(seed):
            state = jnp.zeros((2, 1 << n), dtype=jnp.float32)
            state = state.at[0, 0].set(seed)
            for b, axes in blocks:
                state = apply_matrix(state, b, axes, n)
            p = jnp.sum(state * state, axis=0)
            if with_marg:
                p = marginalize_flat(p, n, sources)
            return jnp.sum(p * p)

        jitted = jax.jit(fn)
        _phase(f"compiling {args.mode} n={args.n} ({len(blocks)} gates)")
        t = time.perf_counter()
        out = jax.block_until_ready(jitted(np.float32(1.0)))
        _phase(f"first call {time.perf_counter() - t:.1f}s -> {float(out)}")
        t = time.perf_counter()
        jax.block_until_ready(jitted(np.float32(1.0)))
        _phase(f"second call {time.perf_counter() - t:.3f}s")
        return

    if args.mode in ("gather", "einsum", "transpose"):
        n = args.n

        def fn(x):
            if args.mode == "gather":
                d = jnp.arange(1 << n, dtype=jnp.int32)
                s = jnp.zeros_like(d)
                for j in range(n):  # full bit reversal indices
                    s = s | (((d >> j) & 1) << (n - 1 - j))
                y = jnp.take(x.reshape(-1), s, axis=-1)
            elif args.mode == "transpose":
                h = n // 2
                y = jnp.transpose(
                    x.reshape(1 << h, 1 << (n - h)), (1, 0)
                )
            else:
                a = x.reshape(6, 1 << (n // 2))
                y = jnp.einsum("ai,aj->ij", a[:, : 1 << 12], a[:, : 1 << 12])
            return jnp.sum(y * y)

        x = np.ones((1 << args.n,), np.float32) / np.sqrt(1 << args.n)
        if args.mode == "einsum":
            x = np.ones((6 << (args.n // 2),), np.float32)
        jitted = jax.jit(fn)
        _phase(f"compiling {args.mode} n={args.n}")
        t = time.perf_counter()
        out = float(jitted(x))
        _phase(f"first call (incl fetch) {time.perf_counter() - t:.1f}s -> {out}")
        t = time.perf_counter()
        out = float(jitted(x))
        _phase(f"second call (incl fetch) {time.perf_counter() - t:.3f}s")
        return

    # fragment/knit modes
    from .cutter.cutter import Cutter
    from .ops.knit import knit_values
    from .ops.variant_engine import FragmentResult, make_sim_fn
    from .virt.virtual_circuit import VirtualCircuit

    cutter = Cutter(circ, maxNPartitions=2,
                    maxNQubitsPerPartition=args.n // 2,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    frag_names = [r.name for r in virt.fragments]
    sims, arg_mats = {}, []
    for name in frag_names:
        sim_one, slot_mats, positions, flat_count = make_sim_fn(virt, name)
        sims[name] = (sim_one, positions, flat_count)
        arg_mats.append(slot_mats)

    def fn(all_mats):
        results = []
        for name, mats in zip(frag_names, all_mats):
            sim_one, positions, flat_count = sims[name]
            if mats:
                values = jax.vmap(sim_one)(mats)
            else:
                row = sim_one([])
                values = jnp.broadcast_to(row, (flat_count, row.shape[0]))
            results.append(FragmentResult(
                name, values, positions, list(virt.programs[name].touching)
            ))
        if args.mode == "frags":
            return sum(jnp.sum(r.values) for r in results)
        knitted, _pos = knit_values(virt, results)
        return jnp.sum(knitted * knitted)

    jitted = jax.jit(fn)
    _phase(f"compiling {args.mode} n={args.n} "
           f"({virt.total_instantiations()} instances)")
    # NOTE: block_until_ready returns early on the tunneled backend; a
    # scalar fetch is the only reliable completion barrier.
    t = time.perf_counter()
    out = float(jitted(arg_mats))
    _phase(f"first call (incl fetch) {time.perf_counter() - t:.1f}s -> {out}")
    t = time.perf_counter()
    out = float(jitted(arg_mats))
    _phase(f"second call (incl fetch) {time.perf_counter() - t:.3f}s")


if __name__ == "__main__":
    main()
