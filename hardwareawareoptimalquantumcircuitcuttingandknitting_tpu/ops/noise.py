"""Noise models: the stand-in for the reference's qiskit fake backends
(FakeKolkataV2 / FakeAthens / FakeOpenPulse2Q-3Q — benchmark.py:5,95,
benchmark_different_backends.py:5,20-22).

Model: per-gate depolarising noise simulated by Pauli-twirl trajectories
(each trajectory inserts one sampled Pauli per physical gate site; the
trajectory axis is vmapped, so the whole noisy ensemble is one XLA launch),
plus exact readout-error application on the final probability vector (a per
-bit 2x2 stochastic matrix contraction — deterministic, no sampling needed).

Every insertion site carries its own (sampling probs, Kraus bank) pair
(:func:`_depol_site` / :func:`_relax_site`), so the same trajectory
machinery also runs NON-unital channels: with ``t1``/``t2`` set on the
model, each physical gate additionally relaxes every touched qubit for
the gate's duration (thermal relaxation — amplitude damping toward |0>
plus the extra dephasing that closes the gap to T2).  Branch i of a site
applies K_i/sqrt(q_i) sampled with probability q_i; the engines average
UN-normalised trajectory rows, so the mean is the exact channel output
(importance-sampled quantum-jump unravelling — no per-trajectory
renormalisation, which would break vmap-static shapes).

Trajectories are drawn BALANCED along the trajectory axis (systematic
allocation + independent permutation per site, :func:`_pauli_idx`):
each trajectory keeps the exact iid marginal — the mean stays an
unbiased channel estimate — but the number of inserted Paulis per site
is pinned to within 1 of its expectation, removing the dominant
all-or-nothing variance of iid draws at small trajectory counts.
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
    """Depolarising + readout error device model.

    Scalar rates apply uniformly; the optional per-qubit vectors
    (``p1_q``/``p2_q``/``ro01_q``/``ro10_q``, device-qubit-indexed)
    override them where present — the analog of qiskit fake backends'
    per-qubit calibration data (reference: FakeKolkataV2 at
    benchmark.py:94-103).  Fragment-local qubit i maps to device qubit i
    (trivial layout, as the reference's AerSimulator.from_backend does
    for untranspiled fragments)."""

    name: str = "generic"
    p1: float = 0.0005          # 1q gate depolarising probability
    p2: float = 0.01            # 2q gate depolarising probability
    readout01: float = 0.015    # P(read 1 | actual 0)
    readout10: float = 0.03     # P(read 0 | actual 1)
    trajectories: int = 16
    num_qubits: int | None = None  # capacity, for per-fragment mapping
    p1_q: np.ndarray | None = None     # [num_qubits] per-qubit 1q rates
    p2_q: np.ndarray | None = None     # [num_qubits]; pair rate = mean
    ro01_q: np.ndarray | None = None   # [num_qubits] P(read 1 | 0)
    ro10_q: np.ndarray | None = None   # [num_qubits] P(read 0 | 1)
    coupling: list | None = None       # device edge list; when set, noisy
                                       # sims route onto the topology
                                       # (circuit/routing.py) so CNOT
                                       # inflation matches backend.run
    untranspiled: bool = False         # emulate the reference's ACTUAL run
                                       # semantics: circuits go to the fake
                                       # backend untranspiled (qvm/run.py:42;
                                       # the transpile call is commented out
                                       # at run.py:40-43), so Aer binds a
                                       # QuantumError only to (basis gate,
                                       # calibrated qubits) pairs — h/t/cz/
                                       # uncoupled-cx execute noise-free and
                                       # no routing happens
    # Thermal relaxation (T1/T2, seconds).  When set, every physical gate
    # additionally applies an amplitude+phase-damping channel to each
    # touched qubit for the gate's duration (the role of qiskit's
    # thermal_relaxation_error in fake-backend noise models).  None = off
    # (the recorded parity tables, NOISY_TABLE.md, were taken without it).
    t1: float | None = None
    t2: float | None = None
    t1_q: np.ndarray | None = None     # [num_qubits] per-qubit T1
    t2_q: np.ndarray | None = None     # [num_qubits] per-qubit T2
    gate_time_1q: float = 35e-9        # typical IBM sx/x duration
    gate_time_2q: float = 300e-9       # typical IBM CX duration
    # Probabilistic error cancellation: insert the signed quasi-inverse
    # of every depolarising site (pec_inverse_site) — the trajectory
    # mean then estimates the NOISELESS circuit at a prod(gamma_s)^2
    # variance cost.  Batched engines only (per-trajectory signed row
    # weights); readout stays physical — invert it separately with
    # ops.mitigation.mitigate_readout.
    pec: bool = False

    def _at(self, vec, scalar, q):
        if vec is None:
            return float(scalar)
        return float(vec[q % len(vec)])

    @property
    def has_relaxation(self) -> bool:
        return any(
            v is not None for v in (self.t1, self.t2, self.t1_q, self.t2_q)
        )

    def relax_gamma_lambda(self, q: int, duration: float) -> tuple[float, float]:
        """Thermal-relaxation channel parameters for device qubit ``q``
        over ``duration`` seconds: amplitude damping
        ``gamma = 1 - e^{-d/T1}`` and the extra phase damping
        ``lam = e^{-d/T1} - e^{-2 d/T2}``, so the coherence decay is
        exactly ``e^{-d/T2}`` (physical for T2 <= 2*T1; clipped at 0
        otherwise)."""
        t1 = self.t1 if self.t1_q is None else float(self.t1_q[q % len(self.t1_q)])
        t2 = self.t2 if self.t2_q is None else float(self.t2_q[q % len(self.t2_q)])
        e1 = 1.0 if t1 is None else float(np.exp(-duration / float(t1)))
        gamma = 1.0 - e1
        lam = 0.0 if t2 is None else max(
            0.0, e1 - float(np.exp(-2.0 * duration / float(t2)))
        )
        return gamma, lam

    def rate_1q(self, q: int) -> float:
        return self._at(self.p1_q, self.p1, q)

    def rate_2q(self, qa: int, qb: int) -> float:
        if self.p2_q is None:
            return float(self.p2)
        return 0.5 * (
            float(self.p2_q[qa % len(self.p2_q)])
            + float(self.p2_q[qb % len(self.p2_q)])
        )

    def readout_matrix(self, q: int) -> np.ndarray:
        e01 = self._at(self.ro01_q, self.readout01, q)
        e10 = self._at(self.ro10_q, self.readout10, q)
        return np.array(
            [[1 - e01, e10], [e01, 1 - e10]], dtype=np.float32
        )


def _line_coupling(n: int) -> list[tuple[int, int]]:
    return [(i, i + 1) for i in range(n - 1)]


def _depol_site(p: float) -> tuple[np.ndarray, np.ndarray]:
    """(probs4, bank4) for a depolarising insertion site: branch i is a
    (unitary) Pauli sampled with the channel probability itself, so the
    trajectory mean of ``|P_i psi|^2`` is the exact channel output."""
    probs = np.array([1.0 - p, p / 3.0, p / 3.0, p / 3.0], np.float64)
    return probs, _PAULI_BLOCKS


def _relax_site(gamma: float, lam: float) -> tuple[np.ndarray, np.ndarray]:
    """(probs4, bank4) for a thermal-relaxation (amplitude + phase
    damping) site.  Kraus operators

        K0 = diag(1, sqrt(1-gamma-lam))   (no jump)
        K1 = [[0, sqrt(gamma)], [0, 0]]   (decay |1> -> |0>)
        K2 = diag(0, sqrt(lam))           (phase jump)

    importance-sampled with q = (1-gamma-lam, gamma, lam): branch i
    applies B_i = K_i/sqrt(q_i), so the UN-normalised trajectory mean
    ``E[|B_i psi|^2] = sum_i |K_i psi|^2`` is the exact (non-unital)
    channel — no state-dependent branching or renormalisation, which
    keeps the vmapped engines shape-static.  Branch norms are bounded
    (||B_1 psi|| <= 1, ||B_0 psi||^2 <= 1/(1-gamma-lam)), so the extra
    trajectory variance stays O(gamma+lam)."""
    q0 = max(1e-12, 1.0 - gamma - lam)
    b0 = np.diag([1.0 / np.sqrt(q0), 1.0])
    b1 = np.array([[0.0, 1.0], [0.0, 0.0]])
    b2 = np.diag([0.0, 1.0])
    bank = np.stack([
        to_real_block(m) for m in (b0, b1, b2, np.zeros((2, 2)))
    ]).astype(_PAULI_BLOCKS.dtype)
    probs = np.array([q0, gamma, lam, 0.0], np.float64)
    return probs / probs.sum(), bank


def pec_inverse_site(p: float) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sampling probs4, bank4, branch_weights4) for the quasi-probability
    INVERSE of the 1-qubit depolarising channel — probabilistic error
    cancellation (PEC), the mitigation twin of QPD gate cutting: with
    eta = 4p/3,

        D_p^{-1} = w0 I + sum_k w_k (P_k . P_k),
        w0 = (1 - eta/4)/(1 - eta),   w_k = -(eta/4)/(1 - eta)

    (sum w_i = 1, one-norm gamma = (1 + eta/2)/(1 - eta)).  Branch i is
    sampled with |w_i|/gamma and the trajectory ROW is multiplied by
    branch_weights[i] = sign(w_i)*gamma — the same importance-sampled
    signed-mixture estimator as the QPD knit itself, so in expectation a
    noise site followed by its inverse site is the identity channel at a
    gamma^2 variance cost."""
    eta = 4.0 * p / 3.0
    assert eta < 1.0, f"depolarising p={p} has no quasi-inverse"
    w = np.array(
        [(1.0 - eta / 4.0) / (1.0 - eta)] + [-(eta / 4.0) / (1.0 - eta)] * 3,
        np.float64,
    )
    gamma = np.abs(w).sum()
    return np.abs(w) / gamma, _PAULI_BLOCKS, np.sign(w) * gamma


def gate_noise_sites(nm: NoiseModel, frag_axes, dev_axes):
    """All (fragment-local qubit, probs4, bank4, weights4-or-None)
    insertion sites for one physical gate on fragment-local qubits
    ``frag_axes`` mapped to device qubits ``dev_axes``: the depolarising
    site (one per gate, on the first qubit — the uncut/cut paths share
    this convention so both circuit forms carry comparable noise
    burdens), then — with ``nm.pec`` — the signed quasi-inverse of the
    depolarising site (:func:`pec_inverse_site`) IMMEDIATELY after it
    (relaxation is non-unital and does not commute with depolarising;
    interleaving relaxation between D and D^-1 would compose
    D^-1∘R∘D != R and bias the mitigated channel by O(p·(gamma+lam))),
    then one thermal-relaxation site per touched qubit when the model
    carries T1/T2.  ``weights4`` is None for ordinary (probability)
    sites; PEC sites carry the per-branch signed row weights."""
    sites = []
    if len(frag_axes) == 1:
        p = nm.rate_1q(dev_axes[0])
        dur = nm.gate_time_1q
    else:
        p = nm.rate_2q(dev_axes[0], dev_axes[1])
        dur = nm.gate_time_2q
    sites.append((frag_axes[0], *_depol_site(p), None))
    if nm.pec and p > 0.0:
        sites.append((frag_axes[0], *pec_inverse_site(p)))
    if nm.has_relaxation:
        for fq, dq in zip(frag_axes, dev_axes):
            gamma, lam = nm.relax_gamma_lambda(dq, dur)
            if gamma > 0.0 or lam > 0.0:
                sites.append((fq, *_relax_site(gamma, lam), None))
    return sites


# IBM heavy-hex basis set (FakeKolkataV2.configuration().basis_gates is
# ['id', 'rz', 'sx', 'x', 'cx', 'reset']); rz/id carry zero gate error on
# the device calibration, so only x/sx bind a 1q error and cx a 2q error.
_BASIS_1Q = frozenset({"x", "sx"})
_BASIS_2Q = frozenset({"cx"})


def untranspiled_site_rate(nm: NoiseModel, name, axes) -> float:
    """Aer's noise-binding rule for an UNtranspiled circuit on a fake
    backend: a QuantumError attaches to (instruction name, exact qubits)
    entries from the device calibration, nothing else.  The reference runs
    both legs this way (qvm/run.py:42 and Utilities.py:44 call
    ``backend.run`` directly; the transpile at qvm/run.py:40-43 is
    commented out), which is why its recorded uncut fidelities are
    readout-dominated (ghz-24: 0.731 = (1-1.27%)^24) rather than
    SWAP-inflated."""
    if name is None or name in ("_defer", "unitary"):
        return 0.0
    if len(axes) == 1:
        return nm.rate_1q(axes[0]) if name in _BASIS_1Q else 0.0
    if name in _BASIS_2Q and nm.coupling is not None:
        a, b = axes[0], axes[1]
        for ca, cb in nm.coupling:
            if (a, b) == (ca, cb) or (a, b) == (cb, ca):
                return nm.rate_2q(a, b)
    return 0.0


def default_noise_model() -> NoiseModel:
    """FakeKolkataV2-flavoured parameters (27-qubit device class)."""
    return NoiseModel(name="fake_kolkata", num_qubits=27)


def fake_kolkata_v2(seed: int = 27, relaxation: bool = False) -> NoiseModel:
    """Per-qubit-calibrated 27-qubit device model standing in for qiskit's
    FakeKolkataV2 (reference noisy benchmark backend, benchmark.py:94-103).

    qiskit is not a dependency here, so the per-qubit calibration vectors
    are synthesised around the device class's published medians (1q error
    ~3e-4, CX error ~9e-3, readout ~1-2%) with a fixed-seed log-normal
    spread, and the medians are tuned so the recorded noisy-fidelity
    table (benchmarks/noisy_parity.py -> NOISY_TABLE.md) brackets the
    reference's committed results (BASELINE.md, fid_plot.py:8-22).

    ``relaxation=True`` additionally calibrates per-qubit T1/T2 around
    the device class's ~100 us / ~70 us medians (thermal-relaxation
    channel on every touched qubit per gate).  Off by default: the
    recorded parity tables were taken depolarising+readout-only, and
    calibration-median depolarising rates already absorb the device's
    average relaxation contribution."""
    from ..circuit.routing import HEAVY_HEX_27

    rng = np.random.default_rng(seed)
    n = 27
    spread = lambda med, s: np.clip(
        med * rng.lognormal(0.0, s, n), med / 6.0, med * 6.0
    )
    # draw order fixed (depol/readout first) so relaxation=True keeps
    # the exact same depolarising/readout calibration as the recorded
    # parity tables and only ADDS the T1/T2 vectors
    p1_q = spread(2.5e-4, 0.5)
    p2_q = spread(2.5e-3, 0.5)
    ro01_q = spread(0.008, 0.4)
    ro10_q = spread(0.017, 0.4)
    t1_q = t2_q = None
    if relaxation:
        t1_q = spread(100e-6, 0.3)
        # physical bound T2 <= 2*T1 (relax_gamma_lambda clips the rest)
        t2_q = np.minimum(spread(70e-6, 0.3), 2.0 * t1_q)
    return NoiseModel(
        name="fake_kolkata_v2" + ("_relax" if relaxation else ""),
        p1=2.5e-4, p2=2.5e-3, readout01=0.008, readout10=0.017,
        trajectories=16,
        num_qubits=n,
        p1_q=p1_q,
        p2_q=p2_q,
        ro01_q=ro01_q,
        ro10_q=ro10_q,
        coupling=HEAVY_HEX_27,
        t1_q=t1_q,
        t2_q=t2_q,
    )


def fake_athens() -> NoiseModel:
    """5-qubit line device (FakeAthens' real topology)."""
    return NoiseModel("fake_athens", 0.0004, 0.012, 0.02, 0.035,
                      num_qubits=5, coupling=_line_coupling(5))


def fake_open_pulse(n: int) -> NoiseModel:
    return NoiseModel(f"fake_openpulse{n}q", 0.001, 0.02, 0.03, 0.05,
                      num_qubits=n, coupling=_line_coupling(n))


def _site_idx(
    rng: np.random.Generator, probs, shape, balance_axis=None
) -> np.ndarray:
    """int32 branch indices sampled from the site's probability vector.

    ``balance_axis``: balanced (Latin-hypercube) sampling along that
    axis — the systematic-resampling allocation pins the number of
    non-identity branches to within 1 of expectation per slice, then an
    independent permutation restores the exact per-element marginal
    (same construction as ops/qpd_sampling.sample_labels
    method="lhs").  The trajectory MEAN stays unbiased while the
    per-site main-effect variance vanishes — load-bearing at the
    default 16 trajectories, where a p2=0.01 site sees 0.16 expected
    insertions and iid draws are all-or-nothing."""
    p = np.asarray(probs, np.float64)
    p = p / p.sum()
    if balance_axis is None:
        return rng.choice(len(p), size=shape, p=p).astype(np.int32)
    ax = balance_axis % len(shape)
    t = shape[ax]
    rest = tuple(d for i, d in enumerate(shape) if i != ax)
    edges = np.cumsum(p)
    edges[-1] = 1.0  # guard fp drift so searchsorted stays in range
    pos = (np.arange(t) + rng.random(rest + (1,))) / t
    ids = np.searchsorted(edges, pos, side="right").astype(np.int32)
    ids = rng.permuted(ids, axis=-1)
    return np.moveaxis(ids, -1, ax)


def _pauli_idx(
    rng: np.random.Generator, p: float, shape, balance_axis=None
) -> np.ndarray:
    """Pauli indices (0 = identity, 1..3 = X/Y/Z) with depolarising
    probability ``p`` — the depolarising-site special case of
    :func:`_site_idx` (bit-identical draws for a given rng state)."""
    return _site_idx(
        rng, [1.0 - p, p / 3.0, p / 3.0, p / 3.0], shape, balance_axis
    )


def _site_active(probs) -> bool:
    """Whether a site can deviate from the identity branch (statically
    known at trace time — inactive sites are skipped, saving one full
    state pass each)."""
    return float(np.asarray(probs)[0]) < 1.0


def _traj_weights(site_w, idxs, shape) -> np.ndarray:
    """Per-trajectory signed row weight: the product of every signed
    quasi-site's sampled branch weight (PEC — pec_inverse_site); ordinary
    probability sites (weights None) contribute 1."""
    w = np.ones(shape, np.float64)
    for w4, idx in zip(site_w, idxs):
        if w4 is not None:
            w = w * np.asarray(w4, np.float64)[idx]
    return w


def _sample_site_blocks(rng: np.random.Generator, site_tabs, shape,
                        balance_axis=None):
    """site_tabs: per-site (probs4, bank4) list [S]; returns real blocks
    [S, *shape, 2, 2, 2, 2] drawn from each site's own bank.
    ``balance_axis``: balanced trajectory allocation per site (see
    :func:`_site_idx`)."""
    return [
        bank[_site_idx(rng, probs, shape, balance_axis)]
        for probs, bank in site_tabs
    ]


def apply_readout_error(
    dist: Distribution, nm: NoiseModel, bit_qubits: list[int] | None = None
) -> Distribution:
    """Exact readout-error channel on the written bits.  ``bit_qubits``:
    per-bit device qubit (aligned with ``dist.bit_positions``) for
    per-qubit calibrated error rates; None uses the model's SCALAR rates
    on every bit (the per-qubit vectors are ignored — a bit index is not
    a device qubit)."""
    k = len(dist.bit_positions)
    if k == 0:
        return dist
    if bit_qubits is None:
        scalar = NoiseModel(
            p1=nm.p1, p2=nm.p2,
            readout01=nm.readout01, readout10=nm.readout10,
        )
        nm = scalar
    # split one bit at a time out of the flat axis: rank stays <= 3 for
    # any k (a (2,)*k reshape + transposes stalls the TPU compiler at
    # k ~ 24 — see ops/bits.py)
    vals = jnp.asarray(dist.values).reshape(-1)
    for j in range(k):
        q = bit_qubits[j] if bit_qubits is not None else j
        m = jnp.asarray(nm.readout_matrix(q))
        high, low = 1 << (k - 1 - j), 1 << j
        v3 = vals.reshape(high, 2, low)
        vals = jnp.einsum("ab,hbl->hal", m, v3).reshape(-1)
    return Distribution(
        np.asarray(vals), dist.bit_positions, dist.num_clbits
    )


def _clbit_qubit_map(circ: Circuit) -> dict[int, int]:
    """clbit -> measured circuit qubit (for readout calibration)."""
    out: dict[int, int] = {}
    for ins in circ.instructions:
        if ins.name == "measure":
            out[ins.clbits[0]] = ins.qubits[0]
    return out


def frag_clbit_qubits(virt: VirtualCircuit, frag_name: str) -> dict[int, int]:
    """clbit -> fragment-local measured qubit.  Original clbits map to the
    data qubit their measure reads; a vgate clbit maps to the slot qubit
    of the (first) measuring endpoint in this fragment — an approximation
    when both endpoints land in one fragment, adequate for calibrated
    readout rates."""
    prog = virt.programs[frag_name]
    out: dict[int, int] = {}
    for kind, payload in prog.source:
        if kind == "ins" and payload.name == "measure":
            out[payload.clbits[0]] = payload.qubits[0]
    for slot in prog.slots:
        cg = virt.num_clbits + slot.vgate_idx
        if slot.ancilla is not None and cg not in out:
            out[cg] = slot.qubit
    return out


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

    # Route onto the device topology when the model carries one: the CNOT
    # inflation from SWAP insertion is where the reference's uncut-vs-cut
    # noisy gap comes from (BASELINE.md CNOT table; cut fragments route
    # almost swap-free).  Ancilla (measure-deferral) ops pass through and
    # carry no gate noise — readout error covers measurement.
    clbit_sources = dict(compiled.clbit_sources)
    gate_ops = [("u", u, axes) for u, axes in compiled.ops]
    phys = None
    slot_device = None
    if nm.coupling is not None and not nm.untranspiled:
        from ..circuit.routing import route_stream

        routed = route_stream(
            gate_ops, circ.num_qubits, clbit_sources, nm.coupling
        )
        gate_ops = routed.ops
        phys = routed.phys
        clbit_sources = routed.clbit_sources
        slot_device = routed.slot_device

    # Insertion sites: (op index, sim qubit, probs4, bank4).  One
    # depolarising site per op — zero-rate sites are KEPT so the rng
    # consumption (and so recorded trajectory draws) is reproducible
    # across models — plus thermal-relaxation sites per touched qubit
    # when the model carries T1/T2 (gate_noise_sites).
    names = compiled.op_names or [None] * len(gate_ops)
    sites: list[tuple[int, int, np.ndarray, np.ndarray, object]] = []
    if nm.untranspiled:
        assert not nm.has_relaxation, (
            "untranspiled mode reproduces the reference's calibration-"
            "bound depolarising semantics; T1/T2 relaxation needs the "
            "calibrated (routed) mode"
        )
        assert not nm.pec, (
            "untranspiled mode is the reference-parity path; PEC needs "
            "the calibrated mode"
        )
        for i, (_, _, axes) in enumerate(gate_ops):
            sites.append((
                i, axes[0],
                *_depol_site(untranspiled_site_rate(nm, names[i], axes)),
                None,
            ))
    else:
        # without routing, phys is None and deferral ops keep their original
        # axes — detect them by op name so bookkeeping CX/SWAP/c_if blocks
        # (measure deferral, statevector.py:168-201) stay noise-free
        for i, (_, _, axes) in enumerate(gate_ops):
            ph = phys[i] if phys is not None else axes
            if any(p is None for p in ph) or (
                phys is None and names[i] == "_defer"
            ):  # touches a deferral ancilla: readout covers it
                sites.append((i, axes[0], *_depol_site(0.0), None))
                continue
            for site in gate_noise_sites(nm, axes, ph):
                sites.append((i, *site))
    sites_after: dict[int, list[int]] = {}
    for s_i, (op_i, *_rest) in enumerate(sites):
        sites_after.setdefault(op_i, []).append(s_i)
    active = [_site_active(pr) for (_, _, pr, _, _) in sites]
    k_traj = nm.trajectories
    if sites and not any(active):
        k_traj = 1  # no noise sites bind: one trajectory IS exact

    blocks = [(to_real_block(u), axes) for _, u, axes in gate_ops]

    def sim_traj(site_mats):
        state = jnp.zeros((2, 1 << n), dtype=jnp.float32)
        state = state.at[0, 0].set(1.0)
        for i, (b, axes) in enumerate(blocks):
            state = apply_matrix(state, b, axes, n)
            # statically-inactive sites always carry the identity block —
            # skipping them at trace time saves one full [2, 2^n] pass
            # per such op (most of the circuit in untranspiled mode)
            for s_i in sites_after.get(i, ()):
                if active[s_i]:
                    state = apply_matrix(
                        state, site_mats[s_i], (sites[s_i][1],), n
                    )
        return jnp.sum(state * state, axis=0)

    if not blocks:
        probs_vec = sim_traj([])
    elif nm.untranspiled:
        # Exact first-order depolarising mixture: with only the few
        # calibration-bound sites carrying noise (p ~ 1e-3 each), the
        # channel composition expands to
        #   P = c0*P_ideal + sum_s p_s*c0/(1-p_s) * mean_{X,Y,Z} P_(s,Pauli)
        # up to O(p^2) ~ 1e-5 — deterministic, unlike trajectory sampling,
        # so the recorded parity table is reproducible run to run.
        site_p = [1.0 - float(pr[0]) for (_, _, pr, _, _) in sites]
        nonzero = [i for i, p in enumerate(site_p) if p > 0.0]
        n_branch = 1 + 3 * len(nonzero)
        ident = _PAULI_BLOCKS[0]
        pauli_all = [
            np.broadcast_to(ident, (n_branch, 2, 2, 2, 2)).copy()
            for _ in sites
        ]
        weights = np.zeros(n_branch, dtype=np.float64)
        c0 = float(np.prod([1.0 - site_p[i] for i in nonzero])) if nonzero else 1.0
        weights[0] = c0
        b = 1
        for i in nonzero:
            for pi in (1, 2, 3):
                pauli_all[i][b] = _PAULI_BLOCKS[pi]
                weights[b] = site_p[i] * c0 / (1.0 - site_p[i]) / 3.0
                b += 1
        batch = max(1, min(n_branch, (1 << 26) // (1 << n)))
        sim_batch = jax.jit(jax.vmap(sim_traj))
        acc = None
        done = 0
        while done < n_branch:
            k = min(batch, n_branch - done)
            idx = np.arange(done, done + batch) % n_branch  # pad by wrap
            pauli = [p[idx] for p in pauli_all]
            w = np.where(np.arange(batch) < k, weights[idx], 0.0)
            part = np.asarray(sim_batch(pauli))
            part = (part * w[:, None].astype(np.float32)).sum(axis=0)
            acc = part if acc is None else acc + part
            done += k
        probs_vec = jnp.asarray(acc / weights.sum())
    else:
        # batch trajectories so the vmapped state block stays <= ~0.5 GB:
        # a [K, 2, 2^n] batch at n=24 would be 2 GB per intermediate.
        batch = max(1, min(k_traj, (1 << 26) // (1 << n)))
        sim_batch = jax.jit(jax.vmap(sim_traj))
        # balanced allocation over the FULL trajectory axis, sliced per
        # batch (wrap-padded so the jitted batch shape stays static)
        idx_all = [
            _site_idx(rng, pr, (k_traj,), balance_axis=0)
            for (_, _, pr, _, _) in sites
        ]
        # PEC: per-trajectory signed row weight = product over signed-
        # quasi-site branch weights (1.0 for ordinary probability sites)
        w_traj = np.ones(k_traj, np.float64)
        for s, idx in enumerate(idx_all):
            w4 = sites[s][4]
            if w4 is not None:
                w_traj *= np.asarray(w4, np.float64)[idx]
        acc = None
        done = 0
        while done < k_traj:
            b = min(batch, k_traj - done)
            sel = np.arange(done, done + batch) % k_traj
            pauli = [
                sites[s][3][idx[sel]] for s, idx in enumerate(idx_all)
            ]
            part = np.asarray(sim_batch(pauli))
            part = (part[:b] * w_traj[sel[:b], None]).sum(axis=0)
            acc = part if acc is None else acc + part
            done += b
        probs_vec = jnp.asarray(acc / k_traj)

    positions = sorted(clbit_sources)
    sources = [clbit_sources[c] for c in positions]
    p = marginalize_flat(probs_vec, n, sources)
    dist = Distribution(np.asarray(p), positions, compiled.num_clbits)
    cq = _clbit_qubit_map(circ)

    def _ro_qubit(c):
        s = clbit_sources[c]
        if slot_device is not None and s < len(slot_device):
            return slot_device[s]  # device node holding the value
        return cq.get(c, c)

    dist = apply_readout_error(
        dist, nm, bit_qubits=[_ro_qubit(c) for c in positions]
    )
    if shots is not None:
        from .sampling import sample_fragment_results

        res = FragmentResult("uncut", dist.values[None, :],
                             dist.bit_positions, [])
        res = sample_fragment_results([res], shots, seed)[0]
        dist = Distribution(res.values[0], dist.bit_positions,
                            dist.num_clbits)
    return dist


def _apply_rows_readout(
    values: np.ndarray,
    bit_positions: list[int],
    nm: NoiseModel,
    bit_qubits: dict[int, int],
) -> np.ndarray:
    """Exact readout channel on ``[V, 2^k]`` rows.  Distributions are
    little-endian (bit j of the flat index carries ``bit_positions[j]``),
    so bit j splits the flat axis as (high=1<<(k-1-j), 2, low=1<<j) —
    the same contraction as the streamed engine and apply_readout_error.
    ``bit_qubits``: clbit -> device qubit for calibrated rates."""
    k = len(bit_positions)
    if not k:
        return values
    v = values
    n_rows = v.shape[0]
    for j in range(k):
        q = bit_qubits.get(bit_positions[j], j)
        m = nm.readout_matrix(q)
        high, low = 1 << (k - 1 - j), 1 << j
        r4 = v.reshape(n_rows, high, 2, low)
        v = np.einsum("ab,vhbl->vhal", m, r4).reshape(n_rows, -1)
    return v


def run_fragment_noisy(
    virt: VirtualCircuit,
    frag_name: str,
    nm: NoiseModel,
    seed: int = 0,
    chunk_size: int = 256,
) -> FragmentResult:
    """Noisy fragment execution: variants x trajectories batched in one
    vmapped program, averaged over the trajectory axis; the per-qubit
    calibrated readout channel is applied to every variant row (device
    nodes from the routed placement when the model carries a coupling
    map)."""
    sim_one, slot_mats, positions, flat_count = make_sim_fn(
        virt, frag_name, noise=nm
    )
    rng = np.random.default_rng(seed)
    k_traj = nm.trajectories
    width = max(1, 2 ** len(positions))
    prog = virt.programs[frag_name]

    site_tabs = [(pr, bank) for (_, _, pr, bank, _) in sim_one.noise_sites]
    site_w = [w for (_, _, _, _, w) in sim_one.noise_sites]

    cq = dict(frag_clbit_qubits(virt, frag_name))
    if sim_one.readout_device is not None:
        cq.update({
            c: d for c, d in sim_one.readout_device.items() if d is not None
        })

    if not prog.slots:
        if site_tabs:
            idxs = [
                _site_idx(rng, pr, (k_traj,), balance_axis=0)
                for pr, _ in site_tabs
            ]
            pauli = [bank[i] for (_, bank), i in zip(site_tabs, idxs)]
            rows = jax.vmap(lambda pm: sim_one([], pm))(pauli)
            w = _traj_weights(site_w, idxs, (k_traj,))
            row = jnp.mean(
                rows * jnp.asarray(w, rows.dtype)[:, None], axis=0
            )
        else:
            # no physical-gate noise sites (e.g. a deferral-only
            # fragment): the exact row IS the trajectory mean, and
            # vmapping over an empty pytree would raise
            row = sim_one([])
        values = np.broadcast_to(np.asarray(row), (flat_count, width)).copy()
        values = _apply_rows_readout(values, positions, nm, cq)
        return FragmentResult(
            frag_name, values, positions, list(prog.touching)
        )

    # batch = variants x trajectories (trajectory axis fastest — matches
    # v_idx below); the trajectory axis is balanced PER VARIANT so every
    # variant row's k_traj-mean loses the per-site main-effect variance
    total = flat_count * k_traj
    v_idx = np.repeat(np.arange(flat_count), k_traj)
    batched_slots = [
        tuple(np.asarray(m)[v_idx] for m in mats) for mats in slot_mats
    ]
    idxs = [
        _site_idx(rng, pr, (flat_count, k_traj), balance_axis=1)
        for pr, _ in site_tabs
    ]
    pauli = [
        bank[i].reshape((total,) + bank.shape[1:])
        for (_, bank), i in zip(site_tabs, idxs)
    ]
    w = _traj_weights(site_w, idxs, (flat_count, k_traj))

    from .variant_engine import chunk_cap, scan_variant_rows

    chunk = min(
        chunk_size, total,
        chunk_cap(virt.programs[frag_name].num_sim_qubits),
    )
    values = scan_variant_rows(
        sim_one, (batched_slots, pauli), total, chunk
    )
    values = values.reshape(flat_count, k_traj, width)
    values = (values * w[:, :, None].astype(np.float32)).mean(axis=1)
    values = _apply_rows_readout(values, positions, nm, cq)
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
    # Untranspiled semantics on a fragment: the instantiations' gates are
    # h/rz/cp/measure-and-QPD ops on fragment-local indices, none of which
    # match a (basis gate, calibrated qubits) entry, so the fake backend
    # executes them noise-free — the reference's recorded cut fidelities
    # are pure 1000-shot sampling (ghz-24 cut 0.99979, sup-20 cut 2.07e-3).
    models = [
        None if (m is not None and getattr(m, "untranspiled", False)) else m
        for m in models
    ]

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
    if engine == "sampled":
        # Monte-Carlo QPD sampling of the NOISY knit: ``shots`` is the
        # label-sample budget (each QPD sample is one circuit execution
        # on hardware, so the budgets coincide); default mirrors
        # run.run_virtual_circuit's capped Hoeffding budget
        from .qpd_sampling import sampled_knit, sampling_overhead

        budget = shots
        if budget is None:
            budget = min(
                sampling_overhead(virt, eps=0.05)["shots_for_eps"],
                2_000_000,
            )
        now = time.perf_counter()
        dist = sampled_knit(
            virt, budget, seed=seed,
            noise=models[: len(virt.fragments)], noise_seed=seed,
        )
        dist = nearest_probability_distribution(dist)
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
        # readout is applied inside run_fragment_noisy (little-endian bit
        # order, routed-device calibrated rates)
        results.append(
            run_fragment_noisy(
                virt, reg.name, nm, seed=seed + i, chunk_size=chunk_size
            )
        )
    if shots is not None:
        from .sampling import sample_fragment_results

        results = sample_fragment_results(results, shots, seed)
    run_time = time.perf_counter() - now
    now = time.perf_counter()
    dist = knit(virt, results)
    knit_time = time.perf_counter() - now
    dist = nearest_probability_distribution(dist)
    return dist, RunTimeInfo(run_time, knit_time)
