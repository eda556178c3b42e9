"""Error mitigation for noisy serving: readout inversion and zero-noise
extrapolation (ZNE).

The reference has no mitigation story (its noisy legs are raw
FakeKolkataV2 runs, reference benchmark.py:94-103); these are the
standard companions of circuit knitting on real hardware, built on this
framework's exact channel representations:

* **Readout inversion** — our readout error is an exact per-bit 2x2
  stochastic contraction (ops/noise.apply_readout_error), so its inverse
  is the exact per-bit inverse-matrix contraction: mitigation recovers
  the pre-readout distribution to float precision (a real device needs
  the same calibration matrices, estimated from preparation circuits).

* **Zero-noise extrapolation** — evaluate an observable at several
  noise-scale factors (the simulator analog of pulse stretching: gate
  depolarising probabilities scale linearly, thermal relaxation scales
  through the gate durations) and Richardson-extrapolate to the
  zero-noise limit.  Composes with the scalar-carry streamed observable
  engine (ops/streamed.streamed_expectation_z), so ZNE serving works at
  any circuit width with one scalar fetch per scale.
"""
from __future__ import annotations

import dataclasses

import numpy as np

from .noise import NoiseModel
from .statevector import Distribution


def mitigate_readout(
    dist: Distribution, nm: NoiseModel, bit_qubits: list[int] | None = None
) -> Distribution:
    """Invert the readout-error channel on a distribution.

    Exact inverse of :func:`ops.noise.apply_readout_error` (same
    little-endian bit contraction, inverse 2x2 matrices): applying both
    in sequence is the identity to float precision.  ``bit_qubits``
    must match the value used when the error was applied (per-bit device
    qubits for calibrated rates; None = the model's scalar rates).

    Mitigated values can dip slightly negative (the inverse of a
    stochastic matrix is not stochastic) — project with
    ``ops.knit.nearest_probability_distribution`` before sampling.
    """
    k = len(dist.bit_positions)
    if k == 0:
        return dist
    if bit_qubits is None:
        nm = NoiseModel(
            p1=nm.p1, p2=nm.p2,
            readout01=nm.readout01, readout10=nm.readout10,
        )
    vals = np.asarray(dist.values, np.float64).reshape(-1)
    for j in range(k):
        q = bit_qubits[j] if bit_qubits is not None else j
        mat = np.asarray(nm.readout_matrix(q), np.float64)
        # det(readout_matrix) = 1 - p01 - p10: rates summing to ~1 make
        # the channel (near-)singular — inversion would amplify noise
        # unboundedly or raise a bare LinAlgError; name the offender
        det = float(np.linalg.det(mat))
        if abs(det) < 1e-6:
            raise ValueError(
                f"readout channel on clbit {dist.bit_positions[j]} "
                f"(device qubit {q}) is numerically singular "
                f"(readout01+readout10 ~ 1, det={det:.2e}); its inverse "
                "is unusable — fix the calibration rates"
            )
        m = np.linalg.inv(mat)
        high, low = 1 << (k - 1 - j), 1 << j
        v3 = vals.reshape(high, 2, low)
        vals = np.einsum("ab,hbl->hal", m, v3).reshape(-1)
    return Distribution(
        vals.astype(np.float32), dist.bit_positions, dist.num_clbits
    )


def scale_noise(nm: NoiseModel, factor: float) -> NoiseModel:
    """Noise-scaled copy of a model — the simulator analog of ZNE pulse
    stretching: gate depolarising probabilities scale linearly (clipped
    to the physical [0, 1] range) and thermal relaxation scales through
    the gate durations (gamma/lambda are duration-exponentials, exactly
    what stretching a pulse by ``factor`` does).  Readout error is NOT
    scaled — gate folding on hardware leaves measurement untouched;
    mitigate it separately with :func:`mitigate_readout`."""
    assert factor >= 0.0
    clip = lambda v: (
        None if v is None
        else np.clip(np.asarray(v, np.float64) * factor, 0.0, 1.0)
    )
    return dataclasses.replace(
        nm,
        p1=float(min(nm.p1 * factor, 1.0)),
        p2=float(min(nm.p2 * factor, 1.0)),
        p1_q=clip(nm.p1_q),
        p2_q=clip(nm.p2_q),
        gate_time_1q=nm.gate_time_1q * factor,
        gate_time_2q=nm.gate_time_2q * factor,
    )


def richardson_extrapolate(scales, values, order: int | None = None) -> float:
    """Zero-noise value from (scale, value) samples by polynomial
    extrapolation.  ``order`` defaults to ``len(scales) - 1`` (exact
    Richardson); a lower order least-squares fit trades bias for
    variance when the evaluations are stochastic (trajectory noise)."""
    s = np.asarray(scales, np.float64)
    v = np.asarray(values, np.float64)
    assert s.shape == v.shape and s.ndim == 1 and len(s) >= 2
    deg = len(s) - 1 if order is None else int(order)
    assert 1 <= deg <= len(s) - 1
    return float(np.polyval(np.polyfit(s, v, deg), 0.0))


def exponential_extrapolate(scales, values) -> float:
    """Zero-noise value assuming exponential decay ``v(s) = a e^{-b s}``
    (the correct model when the observable damps multiplicatively per
    noise site — e.g. parity under depolarising noise): least-squares
    line through ``log v``, evaluated at 0.  Requires positive values;
    falls back to linear Richardson when any sample is <= 0 (deep-noise
    regime where the sign information is gone)."""
    s = np.asarray(scales, np.float64)
    v = np.asarray(values, np.float64)
    if np.any(v <= 0.0):
        return richardson_extrapolate(s, v, order=1)
    return float(np.exp(np.polyval(np.polyfit(s, np.log(v), 1), 0.0)))


def zne_expectation_z(
    virt,
    z_clbits,
    noise,
    scales=(1.0, 2.0, 3.0),
    order: int | None = None,
    method: str = "richardson",
    seed: int = 0,
    trajectories: int | None = None,
    chunk: int = 512,
) -> tuple[float, list[float]]:
    """Zero-noise-extrapolated ``<prod_{c in z_clbits} Z_c>`` of the
    knitted distribution: the streamed scalar-carry observable engine
    evaluated at each noise scale (fresh trajectory seeds per scale),
    Richardson-extrapolated to scale 0.

    ``noise``: NoiseModel or per-fragment list (each entry scaled).
    ``method``: "richardson" (polynomial, ``order``) or "exp"
    (:func:`exponential_extrapolate` — prefer it when the observable is
    a parity that damps multiplicatively, e.g. GHZ <Z...Z>; the exp fit
    is a fixed 2-parameter model, so ``order`` must be left None).
    Returns ``(zne_estimate, per_scale_values)`` — the raw values let
    callers inspect the fit and the scale-1 (unmitigated) baseline.
    """
    from .streamed import streamed_expectation_z

    if method == "exp" and order is not None:
        raise ValueError(
            "method='exp' fits the 2-parameter model a*e^{-b*s}; the "
            f"order={order} polynomial degree does not apply — drop it "
            "or use method='richardson'"
        )
    vals = []
    for i, f in enumerate(scales):
        if isinstance(noise, (list, tuple)):
            nmf = [None if m is None else scale_noise(m, f) for m in noise]
        else:
            nmf = scale_noise(noise, f)
        vals.append(streamed_expectation_z(
            virt, z_clbits, chunk=chunk, noise=nmf,
            trajectories=trajectories, seed=seed + 997 * i,
        ))
    if method == "exp":
        return exponential_extrapolate(scales, vals), vals
    assert method == "richardson", method
    return richardson_extrapolate(scales, vals, order=order), vals
