"""Streamed knit with the chunk axis sharded over a dp mesh (GSPMD)."""
import pytest

from conftest import run_cpu_subprocess

_CODE = """
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.cutter.cutter import Cutter
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.knit import knit
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.streamed import make_streamed_knit
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.variant_engine import run_all_fragments
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import VirtualCircuit

n = 6
circ = Circuit(n, n)
circ.h(0)
for i in range(n - 1):
    circ.cx(i, i + 1)
circ.cz(0, n - 1)
for q in range(n):
    circ.measure(q, q)
cutter = Cutter(circ, maxNPartitions=2, maxNQubitsPerPartition=4,
                maxNQpdCuts=5, maxNCuts=5, maxCutsPerPartitions=5)
assert cutter.solve()
virt = VirtualCircuit(cutter.getResultCircs()[3])

step, xs, meta = make_streamed_knit(virt, chunk=8, share_prefix=SHARE)
if SHARE:
    # the toy circuit must actually engage the ancestor-bank path for
    # this test to prove dp-composition of tree-sharing
    assert any(s is not None for s in meta["splits"]), meta["splits"]
mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))

def shard(leaf):
    arr = np.asarray(leaf)
    if arr.ndim >= 2 and arr.shape[1] % 4 == 0:
        return jax.device_put(
            arr, NamedSharding(mesh, P(None, "dp"))
        )
    return jax.device_put(arr, NamedSharding(mesh, P()))

xs_sharded = jax.tree.map(shard, xs)
vals = np.asarray(jax.jit(step)(xs_sharded))

batched = knit(virt, run_all_fragments(virt))
err = float(np.max(np.abs(vals - np.asarray(batched.values))))
assert err < 2e-6, err
print("SHARDED-STREAM OK", err)
"""


@pytest.mark.slow
def test_streamed_dp_sharded_4dev():
    out = run_cpu_subprocess("SHARE = False\n" + _CODE, 4)
    assert "SHARDED-STREAM OK" in out


@pytest.mark.slow
def test_streamed_dp_sharded_with_tree_sharing_4dev():
    """Tree-sharing (ancestor banks) must compose with dp sharding: the
    banks are built from replicated constants inside the same program and
    gathered by dp-sharded label indices."""
    out = run_cpu_subprocess("SHARE = True\n" + _CODE, 4)
    assert "SHARDED-STREAM OK" in out
