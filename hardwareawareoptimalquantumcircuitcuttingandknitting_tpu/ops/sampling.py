"""Shot sampling: emulate the reference's finite-shot estimates.

The reference converts Aer counts into normalised quasi-distributions
(quasi_distr.py:13-20).  Here we sample multinomial counts from the exact
per-variant probability rows on device, giving statistically identical
behaviour with the sampler vmapped across variants.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .variant_engine import FragmentResult


def _multinomial_rows(key, probs: jnp.ndarray, shots: int) -> jnp.ndarray:
    """Sample multinomial counts for each row of ``probs`` [V, K]."""
    v, k = probs.shape

    def one(key, p):
        # sequential binomial decomposition would be exact but slow for large
        # K; categorical draws are exact and vectorised.
        draws = jax.random.categorical(key, jnp.log(p + 1e-30), shape=(shots,))
        return jnp.bincount(draws, length=k)

    keys = jax.random.split(key, v)
    return jax.vmap(one)(keys, probs)


def sample_distribution(dist, shots: int, seed: int = 0):
    """Multinomial counts/shots from a (non-negative) final distribution —
    the streamed engine's shot path (per-fragment rows never materialise
    there, so sampling happens on the knitted marginal)."""
    from .statevector import Distribution

    p = np.asarray(dist.values, dtype=np.float64).clip(min=0.0)
    total = p.sum()
    if total <= 0:
        raise ValueError("cannot sample from an all-nonpositive distribution")
    rng = np.random.default_rng(seed)
    counts = rng.multinomial(shots, p / total)
    return Distribution(
        (counts / float(shots)).astype(np.float32),
        dist.bit_positions,
        dist.num_clbits,
    )


def sample_fragment_results(
    results: list[FragmentResult], shots: int, seed: int = 0
) -> list[FragmentResult]:
    key = jax.random.PRNGKey(seed)
    rng = np.random.default_rng(seed)
    out = []
    for res in results:
        key, sub = jax.random.split(key)
        v, k = res.values.shape
        # the device categorical materialises a [shots, K] gumbel block per
        # row; past ~2^26 sampled cells that dwarfs the distribution itself
        # (a single 2^24-wide row at 1000 shots would allocate ~67 GB), so
        # wide/low-count blocks sample on host via multinomial instead
        if v * shots * k > (1 << 26):
            vals = np.empty((v, k), dtype=np.float32)
            rows = np.asarray(res.values, dtype=np.float64).clip(min=0.0)
            for i in range(v):
                p = rows[i] / rows[i].sum()
                vals[i] = rng.multinomial(shots, p) / float(shots)
        else:
            probs = jnp.asarray(res.values)
            # guard: rows are probability rows (exact engine); renormalise
            # to absorb float error before sampling
            probs = probs / jnp.sum(probs, axis=1, keepdims=True)
            counts = _multinomial_rows(sub, probs, shots)
            vals = np.asarray(counts, dtype=np.float32) / float(shots)
        out.append(
            FragmentResult(res.name, vals, res.bit_positions, res.touching)
        )
    return out


def smolin_project_traced(vals: jnp.ndarray) -> jnp.ndarray:
    """Traceable (jittable) exact Smolin projection of a flat
    quasi-distribution — the device twin of ``ops.knit.smolin_project``
    (same ascending-scan rule as the reference, quasi_distr.py:28-43).

    Sort-based: the discarded entries are a prefix of the ascending value
    order (see the host twin's derivation); computed with one argsort +
    prefix-sum + scatter, so the full vector never leaves the device.
    Serving shape: project + sample on device, fetch only the sampled
    outcome indices (a dense 2^25 fetch through the tunneled TPU costs
    ~minutes; [shots] int32 costs nothing)."""
    n = vals.shape[0]
    order = jnp.argsort(vals)
    sv = vals[order]
    csum = jnp.concatenate(
        [jnp.zeros((1,), vals.dtype), jnp.cumsum(sv[:-1])]
    )
    denom = (n - jnp.arange(n)).astype(vals.dtype)
    ok = sv + csum / denom >= 0
    any_ok = jnp.any(ok)
    k = jnp.argmax(ok)  # first True (argmax of bool)
    shift = jnp.where(any_ok, csum[k] / denom[k], jnp.zeros((), vals.dtype))
    keep = (jnp.arange(n) >= k) & any_ok
    out_sorted = jnp.where(keep, sv + shift, 0.0)
    return jnp.zeros_like(vals).at[order].set(out_sorted)


def sample_indices_device(
    probs: jnp.ndarray, shots: int, key
) -> jnp.ndarray:
    """[shots] outcome indices multinomial-sampled from a non-negative
    flat distribution by inverse-CDF (cumsum + searchsorted) — no
    [shots, K] intermediate, so it scales to 2^25-wide supports.

    Indices are clipped to the valid range: ``searchsorted`` returns K
    when a draw lands exactly on (or float-rounds up to) the total mass,
    and for a degenerate all-zero input every draw would.  Callers that
    must reject all-nonpositive inputs check the mass separately (the
    streamed shots path fetches it alongside the indices)."""
    cs = jnp.cumsum(probs)
    u = jax.random.uniform(key, (shots,), dtype=probs.dtype) * cs[-1]
    idx = jnp.searchsorted(cs, u, side="right")
    return jnp.minimum(idx, probs.shape[0] - 1)
