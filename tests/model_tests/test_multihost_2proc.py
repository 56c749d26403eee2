"""Real multi-process multihost test: 2 CPU processes, 8 global devices.

Launches two subprocesses that jax.distributed.initialize against each
other, build one global data-parallel mesh over 2x4 virtual CPU devices,
and exercise host_local_to_global (global-array assembly from per-host
shards) and aggregate_metrics (cross-process metric sums) for real —
the single-process no-op paths are covered in test_parallel.py.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]

from instageo_tpu.parallel.multihost import (
    aggregate_metrics, host_local_to_global, initialize_multihost)

initialize_multihost(f"localhost:{port}", 2, pid)
initialize_multihost(f"localhost:{port}", 2, pid)  # idempotent second call
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert jax.device_count() == 8

from instageo_tpu.parallel.mesh import make_mesh

mesh = make_mesh()  # all 8 global devices
assert mesh.devices.size == 8

# Each host contributes a (4, 4) local shard of the (8, 4) global batch
# (the local batch axis must divide over the 4 local devices).
local = np.full((4, 4), float(pid + 1), np.float32)
glob = host_local_to_global(local, mesh)
assert glob.shape == (8, 4), glob.shape

import jax.numpy as jnp

total = float(jax.jit(jnp.sum)(glob))
# global sum = 4*4*1 (host 0) + 4*4*2 (host 1) = 48
assert total == 48.0, total

# Cross-process metric aggregation: tree sums over processes.
agg = aggregate_metrics({"n": np.asarray(pid + 1), "v": np.ones((3,), np.float32)})
assert float(agg["n"]) == 3.0, agg
assert np.allclose(np.asarray(agg["v"]), 2.0)

print(f"MULTIHOST OK {pid}")
"""


@pytest.mark.timeout(600)
def test_two_process_global_arrays(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for pid in ("0", "1"):
        env = dict(os.environ)
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env.pop("PYTEST_CURRENT_TEST", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script), pid, port],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST OK {pid}" in out
