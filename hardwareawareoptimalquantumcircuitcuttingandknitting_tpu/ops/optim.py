"""Population-batched, gradient-free optimisation on cut circuits.

The differentiable sweep (ops/sweep.py) already serves gradient-based
VQE/QAOA.  Hardware-realistic workflows often cannot use exact gradients
(shot-sampled or noisy estimators), so the standard optimisers there are
population-based: SPSA, evolution strategies, CMA-ES.  All of them share
one compute shape — *evaluate the same circuit at P parameter sets per
step* — and that shape is exactly what a TPU wants: ``jax.vmap`` over the
population folds every candidate's full QPD variant fan-out into ONE
batched XLA launch (the MXU sees ``pop x variants`` gate applications
back-to-back instead of P sequential host-driven evaluations), and the
entire optimisation loop runs as a single ``lax.scan`` with zero host
round-trips.

With a ``jax.sharding.Mesh`` carrying a ``dp`` axis the population axis
is additionally sharding-constrained across chips, so each device
evaluates its slice of the population — population-parallel variational
serving on a pod.

The reference has no optimisation story at all: its ansatz generators
(`/root/reference/benchmarks/qcg/QAOA/hw_efficient_ansatz.py`,
`qcg/VQE/uccsd_ansatz.py`) are sampling-only.  This module is
beyond-reference capability mass, built on the same cut-sim-knit
pipeline.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def population_energy(energy, mesh=None, axis: str = "dp"):
    """Batch ``energy(theta) -> scalar`` over a leading population axis.

    Returns ``energies(thetas)`` mapping ``[pop, n_params] -> [pop]``.
    With ``mesh`` (a Mesh whose ``axis`` names the data-parallel axis),
    the population axis is sharding-constrained so GSPMD places each
    candidate's whole cut-sim-knit evaluation on one device slice; call
    the result (or anything jitted around it) inside ``with mesh:``.
    Population sizes divisible by the axis size shard evenly.
    """
    batched = jax.vmap(energy)
    if mesh is None:
        return batched

    from jax.sharding import NamedSharding, PartitionSpec

    theta_s = NamedSharding(mesh, PartitionSpec(axis, None))
    out_s = NamedSharding(mesh, PartitionSpec(axis))

    def energies(thetas):
        thetas = jax.lax.with_sharding_constraint(thetas, theta_s)
        return jax.lax.with_sharding_constraint(batched(thetas), out_s)

    return energies


@dataclass
class OptimResult:
    theta: np.ndarray        # final parameters [n_params]
    energy: float            # energy(theta) at the final parameters
    history: np.ndarray      # per-step population-mean energy [steps]
    evaluations: int         # total energy evaluations folded into launches


def _run_scan(step, theta0, keys, energy, mesh):
    """jit (under ``mesh`` if given) one lax.scan over the whole loop plus
    a final single evaluation; everything stays on device until the end."""

    def loop(theta, keys):
        theta, hist = jax.lax.scan(step, theta, keys)
        return theta, hist, energy(theta)

    fn = jax.jit(loop)
    if mesh is not None:
        with mesh:
            theta, hist, e = fn(theta0, keys)
            theta, hist, e = jax.device_get((theta, hist, e))
    else:
        theta, hist, e = jax.device_get(fn(theta0, keys))
    return np.asarray(theta), float(e), np.asarray(hist)


def spsa_minimize(energy, theta0, *, steps: int, key, pairs: int = 4,
                  a: float = 0.2, c: float = 0.1, alpha: float = 0.602,
                  gamma: float = 0.101, stability: float | None = None,
                  mesh=None) -> OptimResult:
    """Batched SPSA (simultaneous perturbation stochastic approximation).

    Classic SPSA estimates the gradient from one +/- perturbation pair;
    on TPU there is no reason to stop at one: per step, ``pairs``
    independent Rademacher directions give ``2 * pairs`` energies in a
    single vmapped launch and the gradient estimate averages the pairs
    (variance shrinks 1/pairs at no wall-clock cost while the batch fits
    the chip).  Gain schedules are the standard Spall sequences
    ``a_k = a / (k + 1 + A)^alpha``, ``c_k = c / (k + 1)^gamma`` with
    ``A = stability`` (default ``0.1 * steps``).

    ``history[k]`` is the mean of the step's ``2 * pairs`` probe energies
    (a running landscape estimate; no extra evaluation is spent on it).
    """
    theta0 = jnp.asarray(theta0, jnp.float32)
    n = theta0.shape[0]
    big_a = jnp.float32(0.1 * steps if stability is None else stability)
    energies = population_energy(energy, mesh)

    def step(theta, xs):
        k, subkey = xs
        ck = c / (k + 1.0) ** gamma
        ak = a / (k + 1.0 + big_a) ** alpha
        delta = jnp.where(
            jax.random.bernoulli(subkey, 0.5, (pairs, n)), 1.0, -1.0
        ).astype(jnp.float32)
        probes = jnp.concatenate(
            [theta + ck * delta, theta - ck * delta], axis=0
        )
        e = energies(probes)
        e_plus, e_minus = e[:pairs], e[pairs:]
        # 1/delta == delta for Rademacher directions
        ghat = jnp.mean(
            (e_plus - e_minus)[:, None] / (2.0 * ck) * delta, axis=0
        )
        return theta - ak * ghat, jnp.mean(e)

    ks = jnp.arange(steps, dtype=jnp.float32)
    keys = jax.random.split(key, steps)
    theta, e, hist = _run_scan(step, theta0, (ks, keys), energy, mesh)
    return OptimResult(theta, e, hist, evaluations=2 * pairs * steps + 1)


def nes_minimize(energy, theta0, *, steps: int, key, pop: int = 8,
                 sigma: float = 0.15, lr: float = 0.1,
                 fitness_shaping: bool = True, mesh=None) -> OptimResult:
    """Separable natural evolution strategies with antithetic sampling.

    Per step: ``pop`` antithetic Gaussian perturbations (``pop`` even;
    eps and -eps paired) are evaluated in one vmapped launch; the update
    is the fitness-weighted sum of directions.  ``fitness_shaping``
    replaces raw energies by centered ranks (Wierstra et al. 2014's
    utility trick, simplified) for scale-invariance; otherwise energies
    are standardised within the step.
    """
    if pop % 2:
        raise ValueError("pop must be even (antithetic sampling)")
    theta0 = jnp.asarray(theta0, jnp.float32)
    n = theta0.shape[0]
    half = pop // 2
    energies = population_energy(energy, mesh)

    def step(theta, subkey):
        eps_half = jax.random.normal(subkey, (half, n), jnp.float32)
        eps = jnp.concatenate([eps_half, -eps_half], axis=0)
        e = energies(theta + sigma * eps)
        if fitness_shaping:
            ranks = jnp.argsort(jnp.argsort(e)).astype(jnp.float32)
            fit = ranks / (pop - 1) - 0.5  # low energy -> negative utility
        else:
            fit = (e - jnp.mean(e)) / (jnp.std(e) + 1e-8)
        grad = jnp.sum(fit[:, None] * eps, axis=0) / (pop * sigma)
        return theta - lr * grad, jnp.mean(e)

    keys = jax.random.split(key, steps)
    theta, e, hist = _run_scan(step, theta0, keys, energy, mesh)
    return OptimResult(theta, e, hist, evaluations=pop * steps + 1)
