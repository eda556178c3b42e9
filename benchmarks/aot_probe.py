"""AOT executable-persistence probe on the tunneled TPU (VERDICT r4
actions #1b and #8).

The local persistent compile cache only captures CPU compiles (the axon
backend compiles server-side; utils/jaxcache.py), so every process pays
the full server compile — measured 6-664 s for the bench program and
235-840 s for Mosaic kernel deploys.  This probe answers: can
``jax.experimental.serialize_executable`` snapshot a compiled
executable to disk and reload it in a FRESH process, skipping the
server compile?

Three legs, each serialized in one process and deserialized+executed in
a subprocess (the deploy-once/serve-many shape):

  1. a gate-chain XLA program (scan over a [2, 2^15] state) — the
     streamed-engine shape;
  2. a whole-variant-in-VMEM Pallas kernel chunk (ops/pallas_variant)
     on a small fragment — the Mosaic deploy shape;
  3. value equality against the in-process execution.

Writes ``aot_probe.json`` (recorded either way, success or failure).

    python benchmarks/aot_probe.py            # on the TPU
    JAX_PLATFORMS=cpu python benchmarks/aot_probe.py   # CPU rehearsal
"""
from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REPO = pathlib.Path(__file__).resolve().parent.parent
AOT_DIR = REPO / ".jax_aot"

CHILD = r"""
import pickle, sys, time
import numpy as np
import jax
from jax.experimental.serialize_executable import deserialize_and_load

path, = sys.argv[1:]
t0 = time.perf_counter()
with open(path, "rb") as f:
    payload, in_tree, out_tree = pickle.load(f)
t_load = time.perf_counter()
fn = deserialize_and_load(payload, in_tree, out_tree)
t_deser = time.perf_counter()
out = fn()
val = float(np.asarray(out).ravel()[0])
t_exec = time.perf_counter()
print("CHILD_RESULT " + repr({
    "read_s": round(t_load - t0, 3),
    "deserialize_s": round(t_deser - t_load, 3),
    "exec_s": round(t_exec - t_deser, 3),
    "value": val,
}), flush=True)
"""


def _phase(msg):
    print(f"[aot +{time.perf_counter() - T0:7.1f}s] {msg}",
          file=sys.stderr, flush=True)


T0 = time.perf_counter()


def _probe_leg(name, make_fn):
    """make_fn() -> (jit_fn_no_args, expected_value).  Serialize in this
    process; deserialize + execute in a child; report timings."""
    import pickle

    import numpy as np
    from jax.experimental.serialize_executable import serialize

    leg = {"leg": name}
    try:
        fn, expect = make_fn()
        _phase(f"[{name}] lowering + compiling")
        t = time.perf_counter()
        compiled = fn.lower().compile()
        leg["compile_s"] = round(time.perf_counter() - t, 3)
        t = time.perf_counter()
        val = float(np.asarray(compiled()).ravel()[0])
        leg["exec_s"] = round(time.perf_counter() - t, 3)
        leg["value"] = val
        leg["expected"] = expect
        _phase(f"[{name}] compiled {leg['compile_s']}s; serializing")
        t = time.perf_counter()
        payload, in_tree, out_tree = serialize(compiled)
        leg["serialize_s"] = round(time.perf_counter() - t, 3)
        leg["payload_bytes"] = len(payload)
        AOT_DIR.mkdir(exist_ok=True)
        path = AOT_DIR / f"probe_{name}.pkl"
        with open(path, "wb") as f:
            pickle.dump((payload, in_tree, out_tree), f)
        _phase(f"[{name}] {len(payload)} bytes; reloading in subprocess")
        t = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, str(path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            timeout=900, cwd=REPO,
        )
        leg["child_wall_s"] = round(time.perf_counter() - t, 3)
        out = proc.stdout.decode()
        for line in out.splitlines():
            if line.startswith("CHILD_RESULT "):
                child = eval(line[len("CHILD_RESULT "):])  # trusted child
                leg["child"] = child
                leg["match"] = abs(child["value"] - val) < 1e-4
                break
        else:
            leg["status"] = "child produced no result"
            leg["child_tail"] = out[-1500:]
            return leg
        leg["status"] = "ok" if leg.get("match") else "value mismatch"
        leg["speedup_vs_compile"] = round(
            leg["compile_s"]
            / max(child["deserialize_s"] + child["exec_s"], 1e-9), 1
        )
    except Exception as e:  # record the failure — that IS the probe
        leg["status"] = f"failed: {type(e).__name__}: {e}"[:500]
    return leg


def _xla_leg():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    gates = jnp.asarray(rng.normal(size=(24, 4, 4)).astype(np.float32))

    def step(state, g):
        s = state.reshape(2, 4, 1 << 13)
        s = jnp.einsum("ab,rbk->rak", g, s)
        return s.reshape(2, 1 << 15), None

    def run():
        s0 = jnp.zeros((2, 1 << 15), jnp.float32).at[0, 0].set(1.0)
        s, _ = jax.lax.scan(step, s0, gates)
        return (s * s).sum()

    return jax.jit(run), None


def _pallas_leg():
    """A small whole-variant-in-VMEM kernel chunk via the production
    builder (ops/pallas_variant.make_chunk_kernel)."""
    import math

    import jax
    import jax.numpy as jnp
    import numpy as np

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E501
        Circuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E501
        Cutter,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.pallas_variant import (  # noqa: E501
        make_chunk_kernel,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )

    n = 9
    circ = Circuit(2 * n, 2 * n)
    for q in range(2 * n):
        circ.h(q)
    for q in range(2 * n - 1):
        circ.cp(math.pi / 2 ** ((q % 4) + 1), q, q + 1)
    for q in range(2 * n):
        circ.measure(q, q)
    cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=n,
                    maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
    assert cutter.solve()
    virt = VirtualCircuit(cutter.getResultCircs()[3])
    name = virt.fragments[0].name
    built = make_chunk_kernel(
        virt, name, 8, interpret=jax.default_backend() == "cpu"
    )
    assert built is not None, "fragment outside the kernel gate"
    rows_fn, _pos = built
    G = len(virt.vgates)
    lab = jnp.asarray(np.zeros((8, G), np.int32))

    def run():
        return rows_fn(lab).sum()

    return jax.jit(run), None


def main():
    import jax

    device = str(jax.devices()[0])
    t = time.perf_counter()
    import jax.numpy as jnp

    float(jnp.zeros((8,)).sum())
    init_s = time.perf_counter() - t
    _phase(f"backend {device} up in {init_s:.1f}s")

    report = {
        "device": device,
        "load_proxy_first_dispatch_s": round(init_s, 3),
        "legs": [
            _probe_leg("xla_scan", _xla_leg),
            _probe_leg("pallas_vmem_kernel", _pallas_leg),
        ],
    }
    out = REPO / "aot_probe.json"
    out.write_text(json.dumps(report, indent=2))
    print(json.dumps({
        "metric": "aot_probe_ok_legs",
        "value": sum(1 for r in report["legs"]
                     if r.get("status") == "ok"),
        "unit": "legs",
    }))


if __name__ == "__main__":
    main()
