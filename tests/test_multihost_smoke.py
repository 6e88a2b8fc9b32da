"""Multi-host control-plane smoke test.

Launches two REAL processes that rendezvous through
``jax.distributed.initialize`` (the TPU-native replacement for the
reference's ZMQ HostCommunicator + NCCL uniqueID broadcast,
host_communicator.hpp:17-110) and jit a psum + TP-sharded matmul over the
global 2-host mesh. Runs on CPU: each process contributes 2 virtual devices.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

rank = int(sys.argv[1])
coord = sys.argv[2]
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

mesh = Mesh(np.array(jax.devices()).reshape(4), ("tp",))
K, N = 16, 32
w = jnp.arange(K * N, dtype=jnp.float32).reshape(K, N)
x = jnp.ones((4, K), jnp.float32)
with mesh:
    wsh = jax.device_put(w, NamedSharding(mesh, P(None, "tp")))
    xsh = jax.device_put(x, NamedSharding(mesh, P()))
    y = jax.jit(lambda x, w: x @ w, out_shardings=NamedSharding(mesh, P()))(xsh, wsh)
got = np.asarray(jax.device_get(y))
want = np.ones((4, K), np.float32) @ np.arange(K * N, dtype=np.float32).reshape(K, N)
np.testing.assert_allclose(got, want, rtol=1e-5)
print(f"rank {rank} OK", flush=True)
"""


def test_two_process_mesh_smoke(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, str(r), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out)
    for r, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {r} failed:\n{out[-2000:]}"
        assert f"rank {r} OK" in out
