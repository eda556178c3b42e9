"""Shared fidelity helper for the examples (capability parity with the
vendored qvm demo helper, third_party/qvm/examples/fid.py:8-14 — there the
oracle is a 20000-shot Aer run; here it is the exact statevector engine)."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.evaluate import (  # noqa: E402
    hellinger_fidelity,
)
from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E402
    simulate_circuit,
)


def calculate_fidelity(circuit, knitted_result) -> float:
    """Hellinger fidelity of a knitted distribution against the exact
    distribution of the uncut ``circuit``."""
    return hellinger_fidelity(simulate_circuit(circuit), knitted_result)
