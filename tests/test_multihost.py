"""Multi-host layer: 2 real processes, jax.distributed + global mesh +
cross-process batch assembly + an XLA-inserted collective.

Each child process runs with 2 virtual CPU devices; together they form one
4-device global mesh. Every process contributes its local batch rows via
`global_batch` and a jitted global mean (which lowers to a cross-process
all-reduce) must equal the numpy mean over ALL rows — the same contract the
data-parallel train step relies on across hosts.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

CHILD = r"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
coordinator, pid = sys.argv[1], int(sys.argv[2])

from diner_tpu.parallel import init_multihost, make_mesh, global_batch, replicate

init_multihost(coordinator=coordinator, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 2

mesh = make_mesh(axis_names=("data",))
assert mesh.devices.size == 4

# 2 local rows per process; rows are globally ordered by process id
local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 100 * pid
batch = global_batch({"x": local}, mesh)
assert batch["x"].shape == (4, 3), batch["x"].shape

import jax.numpy as jnp

@jax.jit
def global_mean(b):
    return jnp.mean(b["x"])

got = float(global_mean(batch))
want = float(np.mean([np.arange(6).reshape(2, 3) + 100 * p
                      for p in range(2)]))
assert abs(got - want) < 1e-5, (got, want)

# replicate works across hosts too
rep = replicate({"w": np.ones((3,), np.float32)}, mesh)
assert rep["w"].sharding.is_fully_replicated
print(f"proc {pid}: OK global_mean={got}")
"""


def test_two_process_cpu_mesh(tmp_path):
    port = socket.socket()
    port.bind(("127.0.0.1", 0))
    addr = f"127.0.0.1:{port.getsockname()[1]}"
    port.close()

    script = tmp_path / "child.py"
    script.write_text(CHILD)
    repo = str(Path(__file__).resolve().parents[1])
    procs = []
    for pid in range(2):
        env = {
            "PYTHONPATH": repo,
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "HOME": str(tmp_path),
        }
        procs.append(subprocess.Popen(
            [sys.executable, str(script), addr, str(pid)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and ("gloo" in out.lower()
                                  or "collectives" in out.lower()):
            pytest.skip(f"CPU cross-process collectives unavailable: "
                        f"{out[-300:]}")
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid}: OK" in out
