"""Variational (VQE) serving on the real TPU: jitted energy+gradient steps.

Measures the differentiable cut-sim-knit pipeline (ops/hamiltonian.py via
the fragment parity contraction — nothing of size 2^n in any program) on
TFIM chains cut into two fragments.  Records compile time, steady-state
step time (time by fetching the energy scalar — block_until_ready returns
early on axon), energy descent, and the theta0 energy against the host
statevector oracle.  Buffers are tiny (<= 6^cuts x 2 x 2^frag floats), so
tunnel compiles stay in the fast class.

Usage: python benchmarks/vqe_tpu.py [--configs tfim16,tfim20] [--steps 10]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    Circuit,
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.hamiltonian import (  # noqa: E402
    make_hamiltonian_energy,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    compile_circuit,
    run_statevector_host,
)

CONFIGS = {
    # name: (n_qubits, entangling layers, partition cap)
    "tfim16": (16, 1, 9),
    "tfim20": (20, 2, 11),
    # qaoa16: MaxCut on the 16-ring, p=1 (2 params via affine ParamRefs),
    # 2 crossing edges x 2 cx = 4 gate cuts, 1296 instances, 1 group
    "qaoa16": (16, 1, 9),
}


def qaoa_maxcut_terms(n):
    """E = -C for MaxCut on the n-ring: (+0.5, Z_iZ_{i+1}) and -n/2."""
    terms = []
    for i in range(n):
        zz = ["I"] * n
        zz[i] = zz[(i + 1) % n] = "Z"
        terms.append((0.5, "".join(zz)))
    terms.append((-0.5 * n, "I" * n))
    return terms


def build_qaoa_ansatz(n, th, mark=True):
    import networkx as nx

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.qaoa import (
        construct_qaoa_plus,
    )

    params = (
        [ParamRef(0, float(th[0])), ParamRef(1, float(th[1]))]
        if mark else [float(th[0]), float(th[1])]
    )
    return construct_qaoa_plus(P=1, G=nx.cycle_graph(n), params=params)


def tfim(n, j=1.0, h=0.7):
    terms = []
    for i in range(n - 1):
        zz = ["I"] * n
        zz[i] = zz[i + 1] = "Z"
        terms.append((-j, "".join(zz)))
    for i in range(n):
        x = ["I"] * n
        x[i] = "X"
        terms.append((-h, "".join(x)))
    return terms


def build_ansatz(n, layers, th, mark=True):
    c = Circuit(n, n)
    k = 0
    for _ in range(layers):
        for q in range(n):
            c.ry(ParamRef(k, float(th[k])) if mark else float(th[k]), q)
            k += 1
        for i in range(n - 1):
            c.cx(i, i + 1)
    for q in range(n):
        c.ry(ParamRef(k, float(th[k])) if mark else float(th[k]), q)
        k += 1
    return c


def oracle_energy(circ_no_measure, terms, n):
    """Host statevector <H> without densifying H (Z: diag signs,
    X: bit flips; TFIM has no Y)."""
    state = run_statevector_host(compile_circuit(circ_no_measure))
    psi = state[0].astype(np.complex128) + 1j * state[1]
    idx = np.arange(1 << n)
    total = 0.0
    for coeff, pauli in terms:
        phase = np.ones(1 << n)
        flip = 0
        for q, ch in enumerate(pauli):
            if ch == "Z":
                phase = phase * (1.0 - 2.0 * ((idx >> (n - 1 - q)) & 1))
            elif ch == "X":
                flip ^= 1 << (n - 1 - q)
        total += coeff * float(np.real(psi.conj() @ (phase * psi[idx ^ flip])))
    return total


def run_config(key: str, steps: int, reps: int) -> dict:
    import jax
    import jax.numpy as jnp

    n, layers, cap = CONFIGS[key]
    out = {"config": key, "n_qubits": n, "layers": layers,
           "device": jax.devices()[0].device_kind}
    qaoa = key.startswith("qaoa")
    if qaoa:
        terms = qaoa_maxcut_terms(n)
        th0 = np.array([2.0, 1.5])
        build = lambda th, mark=True: build_qaoa_ansatz(n, th, mark)  # noqa: E731
        cuts_budget = 8
    else:
        terms = tfim(n)
        n_params = (layers + 1) * n
        th0 = np.linspace(0.2, 1.7, n_params)
        build = lambda th, mark=True: build_ansatz(n, layers, th, mark)  # noqa: E731
        cuts_budget = 5

    t0 = time.perf_counter()
    energy, info = make_hamiltonian_energy(
        build(th0),
        dict(maxNPartitions=2, maxNQubitsPerPartition=cap,
             maxNQpdCuts=cuts_budget, maxNCuts=cuts_budget,
             maxCutsPerPartitions=cuts_budget),
        terms,
    )
    out["build_s"] = round(time.perf_counter() - t0, 3)
    out["n_groups"] = info.n_groups
    out["n_params"] = info.n_params
    out["instances_per_eval"] = info.instances_per_step

    @jax.jit
    def step(th):
        e, g = jax.value_and_grad(energy)(th)
        return e, th - 0.1 * g

    th = jnp.asarray(th0, jnp.float32)
    t0 = time.perf_counter()
    e0, th = step(th)
    e0 = float(e0)  # scalar fetch = completion barrier on axon
    out["first_step_s"] = round(time.perf_counter() - t0, 2)
    out["e_theta0"] = round(e0, 6)
    out["e_oracle_theta0"] = round(
        oracle_energy(build(th0, mark=False), terms, n), 6
    )

    times = []
    e = e0
    for i in range(steps):
        t0 = time.perf_counter()
        e, th = step(th)
        e = float(e)
        times.append(time.perf_counter() - t0)
    out["steady_step_s"] = round(float(np.median(times[1:] or times)), 4)
    out["steps"] = steps
    out["e_final"] = round(float(e), 6)
    out["descended"] = bool(e < e0)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="tfim16,tfim20")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--out",
        default=str(pathlib.Path(__file__).parent.parent / "vqe_tpu.json"),
    )
    args = ap.parse_args()

    results = []
    for key in args.configs.split(","):
        print(f"[vqe_tpu] {key} ...", flush=True)
        res = run_config(key.strip(), args.steps, args.reps)
        print(json.dumps(res), flush=True)
        results.append(res)

    path = pathlib.Path(args.out)
    existing = []
    if path.exists():
        existing = json.loads(path.read_text())
    keys = {r["config"] for r in results}
    existing = [r for r in existing if r.get("config") not in keys]
    path.write_text(json.dumps(existing + results, indent=2) + "\n")
    print(f"[vqe_tpu] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
