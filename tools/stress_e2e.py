"""Randomized end-to-end stress campaign (CPU).

Generates random circuits and cut configs, runs the full cut-sim-knit
pipeline through multiple engines, and checks every cross-engine and
vs-oracle invariant the framework promises:

  * knitted (unprojected) distribution matches the uncut oracle
    (hellinger fidelity > 1-1e-5, mass ~ 1)
  * streamed scan == batched XLA engine elementwise
  * keep_clbits marginal knit == marginalized full knit
  * projected distribution is a simplex point
  * shot sampling concentrates on the support of the exact distribution
  * plan save -> load -> use_plan reproduces the identical pipeline
  * OpenQASM export/import roundtrip preserves the uncut distribution
  * checkpoint/resume returns bit-identical values
  * differentiable sweep at the template theta matches the engine

Failures are appended to ``stress_failures.jsonl`` with the trial seed so
any failure is replayable:  ``python tools/stress_e2e.py --replay SEED``.

Usage:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
            python tools/stress_e2e.py --trials 300
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time
import traceback

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E402
    Circuit,
    ParamRef,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import (  # noqa: E402
    Cutter,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.plan import (  # noqa: E402
    CutPlan,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (  # noqa: E402
    make_differentiable_sweep,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    simulate_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.run import (  # noqa: E402
    run_virtual_circuit,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E402
    VirtualCircuit,
)

_1Q = ["h", "x", "y", "z", "s", "t", "sdg"]
_1QP = ["rx", "ry", "rz"]
_2Q = ["cx", "cy", "cz", "swap"]
_2QP = ["rzz", "cp"]


def random_circuit(rng: np.random.Generator) -> Circuit:
    n = int(rng.integers(4, 8))
    circ = Circuit(n, n)
    n_gates = int(rng.integers(6, 25))
    for _ in range(n_gates):
        kind = int(rng.integers(0, 4))
        if kind == 0:
            getattr(circ, _1Q[rng.integers(len(_1Q))])(
                int(rng.integers(n))
            )
        elif kind == 1:
            getattr(circ, _1QP[rng.integers(len(_1QP))])(
                float(rng.uniform(-3, 3)), int(rng.integers(n))
            )
        else:
            a = int(rng.integers(n))
            b = int(rng.integers(n - 1))
            if b >= a:
                b += 1
            if kind == 2:
                getattr(circ, _2Q[rng.integers(len(_2Q))])(a, b)
            else:
                getattr(circ, _2QP[rng.integers(len(_2QP))])(
                    float(rng.uniform(-3, 3)), a, b
                )
    for q in range(n):
        circ.measure(q, q)
    return circ


PROBE_HITS: dict = {}  # probe name -> times it actually ran


def _hit(name: str) -> None:
    PROBE_HITS[name] = PROBE_HITS.get(name, 0) + 1


def run_trial(seed: int) -> dict | None:
    """Returns None on success, a failure record dict otherwise."""
    rng = np.random.default_rng(seed)
    circ = random_circuit(rng)
    n = circ.num_qubits
    p = int(rng.integers(2, 4))
    cap = int(rng.integers(3, 6))
    kwargs = dict(
        maxNPartitions=p, maxNQubitsPerPartition=cap,
        maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5,
    )
    if rng.random() < 0.2:
        kwargs["forceNWireCuts"] = 1
    try:
        try:
            cutter = Cutter(circ, **kwargs)
        except ValueError:
            return None  # invalid random config (caps/partitions) — skip
        if not cutter.solve():
            return None  # infeasible budget — nothing to check
        virt = VirtualCircuit(cutter.getResultCircs()[3])

        labels = virt.total_instantiations()
        if labels > 50_000:
            return None  # keep CPU trials bounded

        _hit("pipeline")
        knitted, _ = run_virtual_circuit(virt, project=False)
        ideal = simulate_circuit(circ)
        fid = hellinger_fidelity(ideal, knitted)
        kv = np.asarray(knitted.values, dtype=np.float64)
        total = float(kv.sum())
        if not fid > 1 - 1e-5:
            return {"check": "fidelity", "fid": float(fid)}
        if abs(total - 1.0) > 1e-4:
            return {"check": "mass", "total": total}

        streamed, _ = run_virtual_circuit(
            virt, project=False, engine="streamed",
            chunk_size=int(rng.choice([7, 16, 64])),
        )
        if streamed.bit_positions != knitted.bit_positions:
            return {"check": "streamed_positions"}
        err = float(np.max(np.abs(
            np.asarray(streamed.values, np.float64) - kv
        )))
        if err > 5e-6:
            return {"check": "streamed_vs_batched", "max_err": err}

        # marginal knit vs marginalized full knit
        keep = sorted(
            int(q) for q in rng.choice(n, size=max(1, n // 2), replace=False)
        )
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import (
            knit,
        )
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import (
            run_all_fragments,
        )
        res = run_all_fragments(virt, 1024)
        marg = knit(virt, res, keep_clbits=set(keep))
        mv = np.asarray(marg.values, np.float64)
        # fold the full distribution onto the kept clbits
        kvf = np.zeros(1 << len(keep))
        pos = knitted.bit_positions
        idx = np.arange(kv.size)
        fold = np.zeros_like(idx)
        for j, c in enumerate(keep):
            jsrc = pos.index(c)
            fold |= ((idx >> jsrc) & 1) << j
        np.add.at(kvf, fold, kv)
        merr = float(np.max(np.abs(mv - kvf)))
        if merr > 5e-6:
            return {"check": "marginal_knit", "max_err": merr,
                    "keep": keep}

        # run-level keep_clbits (streamed) == marginalized full knit
        if rng.random() < 0.3:
            _hit("run_keep_clbits")
            marg2, _ = run_virtual_circuit(
                virt, project=False, engine="streamed",
                chunk_size=16, keep_clbits=set(keep),
            )
            m2err = float(np.max(np.abs(
                np.asarray(marg2.values, np.float64) - kvf
            )))
            if marg2.bit_positions != keep or m2err > 5e-6:
                return {"check": "run_keep_clbits", "max_err": m2err,
                        "keep": keep}

        # balanced (LHS) QPD sampling: per-cut counts pinned to n*p and
        # the estimate within the analytic iid bound (LHS is tighter)
        if labels <= 3000 and virt.vgates and rng.random() < 0.3:
            _hit("lhs_sampling")
            from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
                _variant_magnitudes,
                sample_labels,
                sampled_knit,
                sampling_overhead,
            )

            m_s = 1500
            lab = sample_labels(virt, m_s, seed=seed, method="lhs")
            for g, vg in enumerate(virt.vgates):
                mag = _variant_magnitudes(vg.spec)
                pb = mag / mag.sum()
                cnt = np.bincount(lab[:, g], minlength=len(mag))
                if np.abs(cnt - m_s * pb).max() >= 1.0:
                    return {"check": "lhs_balance", "cut": g}
            est = sampled_knit(virt, m_s, seed=seed, method="lhs")
            if est.bit_positions != knitted.bit_positions:
                return {"check": "lhs_positions"}
            gamma = sampling_overhead(virt)["gamma_total"]
            lerr = float(np.max(np.abs(
                np.asarray(est.values, np.float64) - kv
            )))
            if lerr > 6 * gamma / np.sqrt(m_s) + 1e-9:
                return {"check": "lhs_error_bound", "max_err": lerr,
                        "gamma": gamma}

        # eps-targeted adaptive sampling: on return the reported stderr
        # must meet the target and the realised error must be covered
        # (4 sigma + eps slack; the stop rule uses the empirical moments)
        if labels <= 3000 and virt.vgates and rng.random() < 0.2:
            _hit("adaptive_sampling")
            from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
                sampled_knit_adaptive,
            )

            eps_t = float(rng.choice([0.05, 0.02]))
            est, se, used = sampled_knit_adaptive(
                virt, eps_t, seed=seed, initial=256,
                method=str(rng.choice(["iid", "lhs"])),
            )
            if est.bit_positions != knitted.bit_positions:
                return {"check": "adaptive_positions"}
            if float(se.max()) > eps_t:
                return {"check": "adaptive_eps", "stderr": float(se.max()),
                        "eps": eps_t, "used": used}
            aerr = np.abs(np.asarray(est.values, np.float64) - kv)
            if not (aerr <= 4 * se + eps_t).all():
                return {"check": "adaptive_coverage",
                        "max_err": float(aerr.max()), "eps": eps_t}

        # QPD-sampling estimator fed the FULL grid at its exact sampling
        # mass must reproduce the exact knit (unbiasedness identity —
        # deterministic, no Monte-Carlo tolerance)
        if labels <= 3000:
            _hit("qpd_identity")
            from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
                _estimate,
            )

            sizes = [vg.spec.num_instantiations for vg in virt.vgates]
            grid = (
                np.indices(sizes).reshape(len(sizes), -1).T.astype(np.int32)
                if sizes else np.zeros((1, 0), np.int32)
            )
            mass = np.ones(len(grid), np.float64)
            for g, vg in enumerate(virt.vgates):
                c = np.asarray(vg.spec.coef, np.float64)
                m = np.maximum(np.abs(c[:, 0]), np.abs(c[:, 1]))
                mass *= (m / m.sum())[grid[:, g]]
            est = _estimate(virt, grid, mass)
            if est.bit_positions != knitted.bit_positions:
                return {"check": "qpd_identity_positions"}
            qerr = float(np.max(np.abs(
                np.asarray(est.values, np.float64) - kv
            )))
            if qerr > 5e-5:
                return {"check": "qpd_identity", "max_err": qerr}

            # sampled observable estimator on the full grid == the
            # parity fold of the exact knit (deterministic identity)
            _hit("qpd_z_identity")
            from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
                _estimate_z,
            )

            z_sets = [
                set(int(q) for q in rng.choice(
                    n, size=int(rng.integers(1, n + 1)), replace=False
                ))
                for _ in range(3)
            ]
            got_z = _estimate_z(virt, grid, mass, z_sets)
            pos = knitted.bit_positions
            idxs = np.arange(kv.size)
            for zi, zs in enumerate(z_sets):
                par = np.zeros_like(idxs)
                for c in zs:
                    if c in pos:
                        par ^= (idxs >> pos.index(c)) & 1
                want_z = float(np.dot(kv, 1.0 - 2.0 * par))
                if abs(got_z[zi] - want_z) > 5e-5:
                    return {"check": "qpd_z_identity", "z": sorted(zs),
                            "got": float(got_z[zi]), "want": want_z}

            # control variate: stderr never exceeds the plain one and
            # the realised error stays covered
            if virt.vgates and rng.random() < 0.4:
                _hit("cv_sampling")
                from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.qpd_sampling import (
                    sampled_knit,
                )

                m_s = 1500
                ep, sp = sampled_knit(virt, m_s, seed=seed + 7,
                                      with_stderr=True)
                ec, sc = sampled_knit(virt, m_s, seed=seed + 7,
                                      with_stderr=True,
                                      control_variate=True)
                if not (sc <= sp + 1e-12).all():
                    return {"check": "cv_stderr_monotone",
                            "worst": float((sc - sp).max())}
                cerr = np.abs(np.asarray(ec.values, np.float64) - kv)
                if not (cerr <= 5 * sc + 0.02).all():
                    return {"check": "cv_coverage",
                            "max_err": float(cerr.max())}

        # projection is a simplex point
        proj, _ = run_virtual_circuit(virt, project=True)
        pv = np.asarray(proj.values, np.float64)
        if pv.min() < -1e-9 or abs(pv.sum() - 1.0) > 1e-5:
            return {"check": "projection", "min": float(pv.min()),
                    "sum": float(pv.sum())}

        # shot path: samples live on (near) the support of the exact dist
        if labels <= 2000 and rng.random() < 0.5:
            _hit("shots")
            shots = 4000
            sampled, _ = run_virtual_circuit(
                virt, shots=shots, seed=int(rng.integers(1 << 30))
            )
            sv = np.asarray(sampled.values, np.float64)
            sfid = hellinger_fidelity(ideal, sampled)
            if not sfid > 1 - 0.05:
                return {"check": "sampled_fidelity", "fid": float(sfid)}
            # reference-parity Smolin projection removes negative mass but
            # never renormalizes, so sampling noise leaves sum = 1 +- noise
            if abs(sv.sum() - 1.0) > 0.1:
                return {"check": "sampled_mass", "sum": float(sv.sum())}

        # plan save/load + use_plan reproduces the identical pipeline
        if rng.random() < 0.25:
            _hit("plan_roundtrip")
            with tempfile.TemporaryDirectory() as td:
                path = pathlib.Path(td) / "plan.json"
                cutter.save_plan(path)
                cutter2 = Cutter(circ, **kwargs)
                cutter2.use_plan(CutPlan.load(path))
                virt2 = VirtualCircuit(cutter2.getResultCircs()[3])
                re_knit, _ = run_virtual_circuit(virt2, project=False)
            rerr = float(np.max(np.abs(
                np.asarray(re_knit.values, np.float64) - kv
            )))
            if re_knit.bit_positions != knitted.bit_positions or rerr > 1e-12:
                return {"check": "plan_roundtrip", "max_err": rerr}

        # OpenQASM roundtrip preserves the uncut distribution
        if rng.random() < 0.25:
            _hit("qasm_roundtrip")
            circ_rt = Circuit.from_qasm(circ.to_qasm())
            rt = simulate_circuit(circ_rt)
            qerr = float(np.max(np.abs(
                np.asarray(rt.values, np.float64)
                - np.asarray(ideal.values, np.float64)
            )))
            if rt.bit_positions != ideal.bit_positions or qerr > 1e-6:
                return {"check": "qasm_roundtrip", "max_err": qerr}

        # checkpoint/resume: a resumed run equals the fresh run exactly
        if rng.random() < 0.2:
            _hit("checkpoint")
            with tempfile.TemporaryDirectory() as td:
                first, _ = run_virtual_circuit(
                    virt, project=False, checkpoint_dir=td
                )
                resumed, _ = run_virtual_circuit(
                    virt, project=False, checkpoint_dir=td
                )
            cerr = float(np.max(np.abs(
                np.asarray(resumed.values, np.float64)
                - np.asarray(first.values, np.float64)
            )))
            if cerr > 0.0:
                return {"check": "checkpoint_resume", "max_err": cerr}

        # differentiable sweep at the template theta == the engine
        if rng.random() < 0.25:
            marked, n_marked = _mark_params(circ)
            if n_marked:
                cutter3 = Cutter(marked, **kwargs)
                if cutter3.solve():
                    virt3 = VirtualCircuit(cutter3.getResultCircs()[3])
                    want3, _ = run_virtual_circuit(virt3, project=False)
                    _hit("diff_sweep")
                    try:
                        runner, n_params = make_differentiable_sweep(virt3)
                    except NotImplementedError:
                        return None  # a ParamRef landed on a cut gate
                    theta = np.zeros(n_params, np.float32)
                    for ins in marked.instructions:
                        for p in ins.params:
                            if isinstance(p, ParamRef):
                                theta[p.index] = float(p)
                    vals = np.asarray(runner(theta), np.float64)
                    derr = float(np.max(np.abs(
                        vals - np.asarray(want3.values, np.float64)
                    )))
                    if derr > 5e-6:
                        return {"check": "diff_sweep", "max_err": derr}

                    # sampled (stochastic) sweep on the FULL grid must
                    # equal the exact sweep at the same theta
                    if virt3.total_instantiations() <= 3000:
                        _hit("sampled_sweep_identity")
                        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sweep import (
                            make_sampled_sweep,
                        )

                        sizes3 = [
                            vg.spec.num_instantiations
                            for vg in virt3.vgates
                        ]
                        grid3 = (
                            np.indices(sizes3).reshape(len(sizes3), -1)
                            .T.astype(np.int32)
                            if sizes3 else np.zeros((1, 0), np.int32)
                        )
                        mass3 = np.ones(len(grid3), np.float64)
                        for g, vg in enumerate(virt3.vgates):
                            c3 = np.asarray(vg.spec.coef, np.float64)
                            m3 = np.maximum(np.abs(c3[:, 0]),
                                            np.abs(c3[:, 1]))
                            mass3 *= (m3 / m3.sum())[grid3[:, g]]
                        srun, _ = make_sampled_sweep(virt3, grid3, mass3)
                        svals = np.asarray(srun(theta), np.float64)
                        serr2 = float(np.max(np.abs(svals - vals)))
                        if serr2 > 5e-6:
                            return {"check": "sampled_sweep_identity",
                                    "max_err": serr2}
    except Exception:
        return {"check": "exception", "traceback": traceback.format_exc()}
    return None


def _mark_params(circ: Circuit):
    """Rebuild ``circ`` with every parameterised gate angle wrapped in a
    ParamRef; returns (marked_circuit, n_params)."""
    out = Circuit(circ.num_qubits, circ.num_clbits)
    k = 0
    for ins in circ.instructions:
        if ins.name == "measure":
            out.measure(ins.qubits[0], ins.clbits[0])
            continue
        params = []
        for p in ins.params:
            params.append(ParamRef(k, float(p)))
            k += 1
        getattr(out, ins.name)(*params, *ins.qubits)
    return out, k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=200)
    ap.add_argument("--seed0", type=int, default=1000)
    ap.add_argument("--replay", type=int, default=None)
    ap.add_argument(
        "--out", default=str(pathlib.Path(__file__).parent
                             / "stress_failures.jsonl")
    )
    args = ap.parse_args()

    if args.replay is not None:
        rec = run_trial(args.replay)
        print(json.dumps({"seed": args.replay, "failure": rec}, indent=2))
        sys.exit(0 if rec is None else 1)

    t0 = time.time()
    n_fail = 0
    out = pathlib.Path(args.out)
    for i in range(args.trials):
        seed = args.seed0 + i
        rec = run_trial(seed)
        if rec is not None:
            n_fail += 1
            rec["seed"] = seed
            with out.open("a") as f:
                f.write(json.dumps(rec) + "\n")
            print(f"[stress] FAIL seed={seed} check={rec['check']}",
                  flush=True)
        if (i + 1) % 20 == 0:
            print(f"[stress] {i+1}/{args.trials} trials, {n_fail} failures, "
                  f"{time.time()-t0:.0f}s", flush=True)
    print(f"[stress] done: {args.trials} trials, {n_fail} failures, "
          f"{time.time()-t0:.0f}s", flush=True)
    print(f"[stress] probe coverage: {PROBE_HITS}", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
