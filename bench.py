"""Driver benchmark entry point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

This wrapper contains no JAX: it launches the real benchmark
(hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.bench_impl) in a
subprocess so it can enforce a deadline on the tunneled-TPU attempt — the
axon backend's first dispatch alone costs ~3 minutes and can wedge
entirely — and fall back to a CPU run that still reports a real
end-to-end number rather than timing out with nothing.
"""
from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent
# the tunneled backend's server-side compile of the (identical) fused
# program has been measured anywhere from 6 s to 522 s depending on
# server load — leave generous headroom before falling back to CPU
TPU_DEADLINE_S = int(os.environ.get("BENCH_TPU_DEADLINE_S", "1080"))
CPU_DEADLINE_S = int(os.environ.get("BENCH_CPU_DEADLINE_S", "420"))


def _attempt(platform: str, deadline: int) -> dict | None:
    cmd = [
        sys.executable, "-u", "-m",
        "hardwareawareoptimalquantumcircuitcuttingandknitting_tpu.bench_impl",
    ]
    env = dict(os.environ)
    if platform == "cpu":
        cmd += ["--platform", "cpu"]
        env["JAX_PLATFORMS"] = "cpu"
        # the axon sitecustomize dials the TPU relay whenever this is set;
        # a wedged tunnel then hangs even CPU-only python startup
        env.pop("PALLAS_AXON_POOL_IPS", None)
    elif env.get("JAX_PLATFORMS", "").startswith("cpu"):
        # a caller-exported CPU override would silently turn the "tpu"
        # attempt into a CPU run mislabeled as the TPU metric — drop it
        # and let the default platform resolution find the real device
        env.pop("JAX_PLATFORMS")
    print(f"[bench] {platform} attempt (deadline {deadline}s)",
          file=sys.stderr, flush=True)
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, timeout=deadline,
            stdout=subprocess.PIPE, stderr=sys.stderr,
        )
        stdout = proc.stdout
        rc = proc.returncode
    except subprocess.TimeoutExpired as e:
        # bench_impl prints a PARTIAL result line after its end-to-end
        # leg (r5): a deadline kill mid-fused-compile still reports the
        # measured end-to-end instead of nothing
        print(f"[bench] {platform} attempt timed out "
              "(parsing partial output)", file=sys.stderr, flush=True)
        stdout = e.stdout or b""
        rc = 0 if b'"metric"' in stdout else 1
    if rc != 0:
        print(f"[bench] {platform} attempt failed rc={rc}",
              file=sys.stderr, flush=True)
        return None
    for line in reversed(stdout.decode().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                print(f"[bench] {platform} attempt emitted non-JSON "
                      f"brace line: {line[:80]!r}", file=sys.stderr,
                      flush=True)
                continue
    return None


def main() -> None:
    result = _attempt("tpu", TPU_DEADLINE_S)
    if result is None:
        result = _attempt("cpu", CPU_DEADLINE_S)
        if result is not None:
            result["tpu_fallback"] = "cpu"
    if result is None:
        result = {
            "metric": "ghz24_p2q12_steady_serve_step",
            "value": -1, "unit": "s", "vs_baseline": 0,
            "error": "both tpu and cpu attempts failed",
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
