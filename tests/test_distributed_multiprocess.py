"""True multi-process distributed runtime test (2 CPU processes).

The virtual 8-device mesh tests (test_sharding.py) validate sharding
semantics in ONE process; this validates the actual multi-host bring-up
path — ``initialize_distributed`` + cross-process collectives — by
launching two separate Python processes that form a JAX distributed
cluster over localhost, shard a global batch by ``process_index``, and
psum a value across both processes.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from sepreformer_tpu.parallel.distributed import initialize_distributed

coord = sys.argv[1]
pid = int(sys.argv[2])
ok = initialize_distributed(coordinator_address=coord, num_processes=2,
                            process_id=pid)
assert ok, "initialize_distributed returned False in multi-process mode"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()  # 2 local x 2 procs

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils

mesh = Mesh(jax.devices(), ("data",))
# each process contributes its own shard of the global batch
local = jnp.full((2, 4), float(pid + 1), jnp.float32)
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P("data")
)

@jax.jit
def global_sum(x):
    return jnp.sum(x)

total = float(global_sum(garr))
# shards: proc0 contributes 2*4*1, proc1 contributes 2*4*2 -> 24
assert total == 24.0, total

# host-driven control values must reduce identically on every host:
# this is what keeps plateau-LR decisions in lockstep (engine._validate)
from sepreformer_tpu.parallel.distributed import global_sum_scalars
local_valid = [10.0 * (pid + 1), 2.0 * (pid + 1), 3.0]
summed = global_sum_scalars(local_valid)
assert summed == [30.0, 6.0, 6.0], summed

print(f"proc {pid} OK total={total}")
"""


@pytest.mark.skipif(sys.platform != "linux", reason="localhost cluster test")
def test_two_process_cluster(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir)
    )
    # PYTHONPATH breaks this container's axon sitecustomize hook, which is
    # fine here: workers force the CPU platform before importing jax
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK total=24.0" in out
