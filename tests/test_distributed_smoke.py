"""2-process jax.distributed execution smoke (VERDICT r3 item 5).

parallel.mesh.init_distributed was unit-tested for argument handling in
r3 but had never EXECUTED a multi-process collective.  This test spawns
two real CPU processes, initializes the coordination service through
init_distributed (the unit under test), builds a global 2-device mesh,
and runs a cross-process all-gather + a jit psum over the mesh —
the minimal end-to-end proof that the multi-host code path works.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)       # one device per process
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, os.environ["VCT_REPO"])
from vct_tpu.parallel import mesh as meshlib

n = meshlib.init_distributed()
assert n == 2, n
assert jax.process_count() == 2
assert len(jax.devices()) == 2          # one local CPU device per process

from jax.experimental import multihost_utils
pid = jax.process_index()
got = multihost_utils.process_allgather(np.asarray([pid], np.int32))
assert sorted(got.reshape(-1).tolist()) == [0, 1], got

# a jit'd psum over the global ('data', 'model') mesh
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = meshlib.make_mesh(n_data=2, n_model=1)
repl = NamedSharding(mesh, P())
x = multihost_utils.host_local_array_to_global_array(
    np.asarray([[1.0 + pid]], np.float32), mesh, P("data"))
y = jax.jit(lambda v: v.sum(), out_shardings=repl)(x)
total = float(multihost_utils.process_allgather(
    np.asarray(0.0, np.float32)).sum() + 0.0)  # barrier-ish
assert abs(float(jax.device_get(
    multihost_utils.global_array_to_host_local_array(
        y, mesh, P()))) - 3.0) < 1e-6
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collective(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "NUM_PROCESSES": "2",
            "PROCESS_ID": str(pid),
            "VCT_REPO": repo,
            "JAX_PLATFORMS": "cpu",
        })
        env.pop("XLA_FLAGS", None)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "OK" in out, out
