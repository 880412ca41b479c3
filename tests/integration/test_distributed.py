"""Multi-host (DCN) dry run with two CPU processes (VERDICT r1 item 9;
SURVEY.md §5.8): exercises runtime.debug.maybe_init_distributed end-to-end —
coordinator rendezvous, a global 2×4-device view, and a cross-process psum
over the global mesh.
"""

import pathlib
import socket
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]

_CHILD = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/tpucdc_jax_cpu_cache")
from tpucdc.runtime.debug import maybe_init_distributed
assert maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
assert len(jax.devices()) == 8

# Cross-process collective over the global (data, model) mesh.
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from tpucdc.runtime import make_mesh
mesh = make_mesh(n_data=8)
pid = jax.process_index()

def global_sum(x):
    return jnp.sum(x)

arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.full((4,), pid + 1.0, np.float32),
    (8,))
total = jax.jit(global_sum, out_shardings=NamedSharding(mesh, P()))(arr)
# processes 0 and 1 contribute 4*1 + 4*2 = 12; the P() output is fully
# replicated so every process can read it directly.
got = float(np.asarray(jax.device_get(total)))
assert got == 12.0, got
print("proc", pid, "ok", got)
"""


def test_two_process_dcn_dryrun(tmp_path):
    port = _free_port()
    procs = []
    for pid in range(2):
        env = {
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": "/root",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "TPUCDC_COORDINATOR": f"localhost:{port}",
            "TPUCDC_NUM_PROCESSES": "2",
            "TPUCDC_PROCESS_ID": str(pid),
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=str(REPO))],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"proc {pid} ok 12.0" in out


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]
