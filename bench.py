"""Driver benchmark: end-to-end cut + simulate + knit on real TPU hardware.

Config: ghz-24 P2 Q12 — a headline config of the reference, whose end-to-end
wall-clock (cut-search only, CUT_ONLY pipeline, no simulation at all) is
878.4 s on the reference's hardware (BASELINE.md: ghz 24q d1 P2 Q12 =
14 min 38.4 s).  This bench does strictly more work — optimal cut search +
full QPD variant simulation + knit + fidelity check against the uncut
statevector — and reports the speedup as vs_baseline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

import jax

# persistent compilation cache: amortises the ~60 s/program compile cost of
# the tunneled TPU backend across runs
cache_dir = pathlib.Path(__file__).resolve().parent / ".jax_cache"
try:
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

REF_WALL_SECONDS = 878.4  # BASELINE.md ghz 24q d1 P2 Q12 (cut-search only)


def main() -> None:
    import logging

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (
        Cutter,
    )
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
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.utils.logger import (
        get_logger,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (
        VirtualCircuit,
    )

    get_logger().setLevel(logging.WARNING)

    t0 = time.perf_counter()
    circ = genCirc("ghz", 24, 1)
    cutter = Cutter(
        circ, maxNPartitions=2, maxNQubitsPerPartition=12,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    assert cutter.solve()
    solve_t = time.perf_counter() - t0

    _, _, _, cut_circ, _ = cutter.getResultCircs()
    virt = VirtualCircuit(cut_circ)
    knitted, info = run_virtual_circuit(virt, project=False)
    total_t = time.perf_counter() - t0

    # fidelity check outside the timed window (the reference's CUT_ONLY
    # baseline doesn't simulate at all)
    ideal = simulate_circuit(circ)
    fid = hellinger_fidelity(ideal, knitted)

    print(
        json.dumps(
            {
                "metric": "ghz24_p2q12_cut_sim_knit_wall",
                "value": round(total_t, 3),
                "unit": "s",
                "vs_baseline": round(REF_WALL_SECONDS / total_t, 2),
                "solve_s": round(solve_t, 3),
                "sim_s": round(info.run_time, 3),
                "knit_s": round(info.knit_time, 3),
                "fidelity_vs_uncut": float(fid),
                "instances": virt.total_instantiations(),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
