"""REAL multi-process validation of the multi-host layer.

The 8-virtual-device CPU mesh tests elsewhere are single-process; this
spawns TWO OS processes that rendezvous through `init_distributed`
(jax.distributed + a local coordinator), form one global 8-device mesh
(4 local devices each), and assemble a globally-sharded batch with
`global_batch_from_local` — the exact entry path `cli/train --multihost`
takes on a TPU pod (parallel/mesh.py:119-171), where each host feeds
only its local slice and no process ever materializes the full batch.

Asserts, per process: process_count/global-device topology, global batch
geometry, cross-process reduction seeing BOTH processes' data, and
process-order concatenation semantics.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); port = sys.argv[2]
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from marigold_tpu.parallel.mesh import (
    get_mesh, global_batch_from_local, init_distributed,
)

# env vars are ignored once a site plugin registered (see
# force_cpu_devices docstring); set the config BEFORE any backend or
# distributed init
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
n = init_distributed(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert n == 2, n
assert jax.process_count() == 2
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

mesh = get_mesh(8)
# process p contributes 8 rows filled with p+1 -> global batch 16
# (global batch must divide the 8-device mesh: 2 rows per device)
local = {"x": np.full((8, 3), float(pid + 1), np.float32)}
gb = global_batch_from_local(mesh, local)
assert gb["x"].shape == (16, 3), gb["x"].shape
assert not gb["x"].sharding.is_fully_replicated

repl = NamedSharding(mesh, P())

@functools.partial(jax.jit, out_shardings=repl)
def stats(b):
    return jnp.mean(b["x"]), b["x"] * 1.0

mean, full = stats(gb)
np.testing.assert_allclose(float(mean), 1.5)  # sees BOTH processes
expected = np.concatenate(
    [np.full((8, 3), 1.0, np.float32), np.full((8, 3), 2.0, np.float32)]
)
np.testing.assert_array_equal(np.asarray(full), expected)
print(f"MULTIPROC_OK {pid}", flush=True)
"""


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_and_global_batch():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    # CPU-only workers: drop TPU-plugin site dirs — their sitecustomize
    # dials the remote TPU at interpreter startup and hangs every new
    # python process when the tunnel is down.
    keep = [
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join([REPO, *keep])
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(pid), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=REPO,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIPROC_OK {pid}" in out, out
