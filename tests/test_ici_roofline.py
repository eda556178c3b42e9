"""ICI roofline for the sharded engines (VERDICT r3 action #5).

The model (ops/roofline.sharded_fragment_cost / sharded_sv_cost) walks
the exact op stream the engines build and predicts per-device ppermute
payload bytes.  Real multi-chip hardware is unavailable here, so the
obtainable evidence is communication VOLUME: compile the real shard_map
program on a virtual 8-device CPU mesh and parse the HLO for
collective-permute ops — counts and payload bytes must equal the model
exactly.
"""
import json
import textwrap

from conftest import run_cpu_subprocess

from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (
    sharded_fragment_cost,
    sharded_sv_cost,
)

_HLO_SCAN = r"""
import re


def collective_stats(hlo: str):
    '''(#collective-permute sites, payload bytes; all-reduce bytes) from
    HLO text.  -start/-done async pairs count once (the -start carries
    the operand shape; -done lines are skipped).'''
    cp_n, cp_b, ar_b = 0, 0, 0
    pat = re.compile(r"=\s*\(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
                     r"\b(collective-permute|all-reduce)(?:-start)?\(")
    for line in hlo.splitlines():
        if "collective-permute-done" in line or "all-reduce-done" in line:
            continue
        m = pat.search(line)
        if not m:
            continue
        dt, dims, kind = m.groups()
        size = 1
        for d in dims.split(","):
            if d:
                size *= int(d)
        nbytes = size * {"f32": 4, "bf16": 2, "f64": 8,
                         "u32": 4, "s32": 4}[dt]
        if kind == "collective-permute":
            cp_n += 1
            cp_b += nbytes
        else:
            ar_b += nbytes
    return cp_n, cp_b, ar_b
"""


def _frag_setup(nbig: int) -> str:
    return textwrap.dedent(
        f"""
        import numpy as np, jax, json
        from jax.sharding import Mesh
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit, Instruction, Register
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import VirtualCircuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import VirtualGateOp

        nbig = {nbig}
        cut = Circuit([Register("frag0", nbig), Register("frag1", 2)], nbig + 2)
        cut.h(0)
        for i in range(nbig - 1):
            cut.cx(i, i + 1)
        for q in range(nbig):
            cut.rz(0.1 * (q + 1), q)
        cut.append(Instruction("vgate", [nbig - 1, nbig], op=VirtualGateOp("cz")))
        cut.cx(nbig, nbig + 1)
        for q in range(nbig + 2):
            cut.measure(q, q)
        virt = VirtualCircuit(cut)
        """
    )


def test_sharded_fragment_ppermute_volume_matches_model():
    """dp=2 x amp=4 over 8 virtual devices: HLO collective-permute
    payload bytes == model's (ici_bytes - psum_bytes); call-site count
    == the per-variant ppermute sites (vmap batches them); all-reduce
    payload == v_dev * 2^m marginal scatter."""
    code = _frag_setup(10) + _HLO_SCAN + textwrap.dedent(
        """
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sharded_fragment import make_sharded_fragment_fn
        fn, args, shardings, meta = make_sharded_fragment_fn(
            virt, "frag0",
            Mesh(np.array(jax.devices()).reshape(2, 4), ("dp", "amp")),
        )
        jitted = jax.jit(fn, in_shardings=shardings)
        hlo = jitted.lower(*args).compile().as_text()
        cp_n, cp_b, ar_b = collective_stats(hlo)
        prog = virt.programs["frag0"]
        print(json.dumps({
            "cp_n": cp_n, "cp_b": cp_b, "ar_b": ar_b,
            "m_bits": len(prog.clbit_sources),
        }))
        """
    )
    out = run_cpu_subprocess(code, 8, timeout=900)
    got = json.loads(out.strip().splitlines()[-1])

    # host-side model (no jax device needed for the count)
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import (  # noqa: E501
        Circuit,
        Instruction,
        Register,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_circuit import (  # noqa: E501
        VirtualCircuit,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.virt.virtual_gates import (  # noqa: E501
        VirtualGateOp,
    )

    nbig = 10
    cut = Circuit([Register("frag0", nbig), Register("frag1", 2)],
                  nbig + 2)
    cut.h(0)
    for i in range(nbig - 1):
        cut.cx(i, i + 1)
    for q in range(nbig):
        cut.rz(0.1 * (q + 1), q)
    cut.append(Instruction("vgate", [nbig - 1, nbig],
                           op=VirtualGateOp("cz")))
    cut.cx(nbig, nbig + 1)
    for q in range(nbig + 2):
        cut.measure(q, q)
    virt = VirtualCircuit(cut)
    cost = sharded_fragment_cost(virt, "frag0", dp=2, amp=4)

    assert got["cp_b"] == cost.ici_bytes - cost.psum_bytes, (got, cost)
    # all-reduce payload: per-variant [2^m] f32 marginal, batched by vmap
    assert got["ar_b"] == cost.variants_per_device * (
        1 << got["m_bits"]
    ) * 4, (got, cost)
    # call sites: per-variant ppermutes are vmap-batched into one op each
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.fusion import (  # noqa: E501
        fused_stream,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.roofline import (  # noqa: E501
        _sharded_op_counts,
    )

    skeleton, _ = fused_stream(virt.programs["frag0"].ops)
    first_slot = next(
        (i for i, op in enumerate(skeleton)
         if op[0] not in ("u", "u_aux")), len(skeleton),
    )
    pre_pp, _, _ = _sharded_op_counts(skeleton[:first_slot], 2)
    suf_pp, _, _ = _sharded_op_counts(skeleton[first_slot:], 2)
    assert got["cp_n"] == pre_pp + suf_pp, (got, pre_pp, suf_pp)


def test_sharded_sv_ppermute_volume_matches_model():
    """Uncut amplitude-sharded sim (amp=8): HLO collective-permute bytes
    == model."""
    code = _HLO_SCAN + textwrap.dedent(
        """
        import numpy as np, jax, json
        from jax.sharding import Mesh
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.circuit.circuit import Circuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import genCirc
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import compile_circuit
        from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.sharded_sv import make_sharded_sim

        circ = genCirc("ghz", 10, 1)
        compiled = compile_circuit(circ)  # unfused: the sharded engine needs <=2q gates on global qubits
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("amp",))
        fn, state0, sharding, keep = make_sharded_sim(compiled, mesh, "amp")
        jitted = jax.jit(fn, in_shardings=(sharding,))
        hlo = jitted.lower(state0).compile().as_text()
        cp_n, cp_b, ar_b = collective_stats(hlo)
        print(json.dumps({
            "cp_n": cp_n, "cp_b": cp_b, "ar_b": ar_b,
            "keep": len(keep), "n": compiled.num_sim_qubits,
        }))
        """
    )
    out = run_cpu_subprocess(code, 8, timeout=900)
    got = json.loads(out.strip().splitlines()[-1])

    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.models.zoo import (  # noqa: E501
        genCirc,
    )
    from hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.ops.statevector import (  # noqa: E501
        compile_circuit,
    )

    compiled = compile_circuit(genCirc("ghz", 10, 1))
    cost = sharded_sv_cost(compiled, amp=8, keep_bits=got["keep"])
    assert got["cp_b"] == cost.ici_bytes - cost.psum_bytes, (got, cost)
    assert got["ar_b"] == (1 << got["keep"]) * 4
