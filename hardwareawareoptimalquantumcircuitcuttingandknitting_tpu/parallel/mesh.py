"""Device-mesh construction and sharding helpers.

The reference's only parallelism is 2 Python threads + Pool(8) (SURVEY §2.5).
The TPU-native analog is a 2D device mesh:

  * axis "dp" — the QPD *variant* axis (the dominant data-parallel axis:
    6^g * 8^w instantiations, qvm/run.py:36-45);
  * axis "tp" — the *amplitude* axis of a fragment statevector (tensor
    parallel: 2^q amplitudes sharded over ICI for large fragments).

Knitting's signed reduction over the variant axis becomes a psum over "dp";
gate applications crossing the sharded amplitude axis lower to XLA
collective-permutes over "tp" automatically under GSPMD.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int | None = None, dp: int | None = None, tp: int | None = None
) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and tp is None:
        # favour the variant axis; amplitude sharding only when dp saturates
        tp = 1
        dp = n
    elif dp is None:
        dp = n // tp
    elif tp is None:
        tp = n // dp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.array(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def variant_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis = variants, sharded over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
