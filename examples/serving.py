"""Solve-once / serve-many: the production deployment shape.

The reference re-runs its whole pipeline per experiment.  Here the cut
plan is solved once (host), saved as JSON, and the compiled cut-sim-knit
step is then re-executed per request — three serving modes:

  1. exact distribution (the batched engine),
  2. finite-shot counts (projection + multinomial sampling ON DEVICE —
     only the sampled outcome indices leave the chip),
  3. <Z...Z> observables with a SCALAR carry (works at any circuit
     width; no distribution materialises anywhere).

Run: python examples/serving.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from fid import calculate_fidelity  # noqa: E402

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E402
    genCirc,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (  # noqa: E402
    streamed_expectation_z,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)


def main() -> None:
    circ = genCirc("ghz", 10, 1)

    # ---- plan once (host) ------------------------------------------------
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=6,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    cutter.save_plan("/tmp/serving_cut_plan.json")  # resume/audit artifact
    virt = VirtualCircuit(cutter.getResultCircs()[3])

    # ---- serve: exact distribution --------------------------------------
    dist, info = run_virtual_circuit(virt)
    print(f"exact: fidelity={calculate_fidelity(circ, dist):.8f} "
          f"(run {info.run_time:.2f}s, knit {info.knit_time:.2f}s)")

    # ---- serve: finite-shot counts (sampled on device) -------------------
    sampled, _ = run_virtual_circuit(virt, engine="streamed", shots=20000)
    print(f"20000 shots: fidelity={calculate_fidelity(circ, sampled):.5f}")

    # ---- serve: steady-state step, banks hoisted -------------------------
    # at deploy, build the tree-sharing ancestor banks ONCE and pass them
    # to every step — the per-request step pays only gather + suffix
    # (this is what benchmarks/northstar_tpu.py measures)
    import jax
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import (
        make_streamed_knit,
    )

    step_fn, xs, meta = make_streamed_knit(
        virt, chunk=64, share_prefix=True, hoist_banks=True
    )
    banks = (jax.jit(meta["bank_fn"])()
             if meta["bank_fn"] is not None else None)
    step = jax.jit(step_fn)
    values = np.asarray(step(xs, banks))   # request 1 (compiles)
    values = np.asarray(step(xs, banks))   # request 2 (steady state)
    print(f"hoisted-bank step: sum={float(values.sum()):.6f} "
          f"splits={[s is not None for s in meta['splits']]}")

    # ---- serve: bf16 quantized mode (shot-serving deployments) ----------
    # dtype=jnp.bfloat16 halves state/bank HBM bytes — measured 2.7-3x on
    # sup-20-class serving steps (bf16_ab_probe.json) at ~2e-4 exact-
    # fidelity cost, invisible under 20k-shot noise.  Keep f32 for
    # exact-parity work.
    import jax.numpy as jnp

    b16_step, b16_xs, b16_meta = make_streamed_knit(
        virt, chunk=64, share_prefix=True, hoist_banks=True,
        dtype=jnp.bfloat16,
    )
    b16_banks = (jax.jit(b16_meta["bank_fn"])()
                 if b16_meta["bank_fn"] is not None else None)
    b16_values = np.asarray(jax.jit(b16_step)(b16_xs, b16_banks))
    drift = float(np.abs(b16_values - values).max())
    print(f"bf16 step: max |bf16 - f32| = {drift:.2e}")

    # ---- serve: observables (scalar carry, any width) --------------------
    # the reference's GHZ has 2n clbits (measure_all adds a register,
    # helper_functions.py:154-161) — the measured bits are the written
    # positions of the distribution
    bits = dist.bit_positions
    for z in ([bits[0]], [bits[0], bits[-1]], list(bits)):
        ez = streamed_expectation_z(virt, z)
        print(f"<Z{z}> = {ez:+.6f}")
    # GHZ: odd-weight parities = 0, even-weight parities = +1


if __name__ == "__main__":
    main()
