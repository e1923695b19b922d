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


_ENGINE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from sepreformer_tpu.parallel.distributed import initialize_distributed

coord, pid, corpus, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
ok = initialize_distributed(coordinator_address=coord, num_processes=2,
                            process_id=pid)
assert ok and jax.process_count() == 2

from sepreformer_tpu.config import (
    DatasetConfig, EngineConfig, ModelConfig, OptimConfig, VariantConfig,
)
from sepreformer_tpu.data.dataset import build_dataloaders
from sepreformer_tpu.engine.engine import Engine
from sepreformer_tpu.parallel.mesh import create_mesh

cfg = VariantConfig(
    name="mp-engine",
    model=ModelConfig(num_stages=1, num_spks=2, enc_dim=16, enc_kernel=16,
                      enc_stride=4, feat_dim=16, num_heads=2, pos_maxlen=64,
                      local_kernel=9, down_kernel=5, dropout=0.0),
    optim=OptimConfig(lr=1e-3, warmup_steps=2),
    dataset=DatasetConfig(scp_dir="scp", max_len=4000, batch_size=2,
                          num_workers=1),
    # test_epochs=(1,): the round-1 advisor reproduced a crash when the
    # inline mid-train test ran under an active mesh (batch-1 test batches
    # cannot shard over the data axis) — exercise exactly that path
    engine=EngineConfig(max_epoch=2, start_scheduling=0, test_epochs=(1,)),
)
loaders = build_dataloaders(cfg.dataset, "train", scp_root=corpus,
                            host_id=pid, num_hosts=2)
# cross-host lockstep: both hosts must report the identical step count
n_steps = len(loaders["train"])
# host-sharded test set: the shards must partition the keys exactly
test_keys_local = loaders["test"].dataset.keys[pid::2]
mesh = create_mesh(4, 1)  # 2 procs x 2 local devices, pure data parallel
engine = Engine(cfg, workdir, loaders, mesh=mesh)
res = engine.run("train")
h = res["history"]
assert len(h) == 1, h
import math
assert all(math.isfinite(e["time_loss"]) and math.isfinite(e["valid"])
           for e in h), h

# multi-host _test: each utterance evaluated exactly once (host-sharded
# loader + merged CSV) and the summary metric identical on both hosts
out = engine._test(compute_sdr=False)
from jax.experimental import multihost_utils
multihost_utils.sync_global_devices("csv_check")
if pid == 0:
    import csv as _csv
    with open(os.path.join(workdir, "test_SISNRi_value.csv")) as f:
        rows = list(_csv.reader(f))
    keys = [r[0] for r in rows]
    all_keys = sorted(engine.loaders["test"].dataset.keys)
    assert keys == all_keys, (keys, all_keys)
print(f"proc {pid} ENGINE OK steps={n_steps} valid={h[0]['valid']:.6f} "
      f"sisnri={out['sisnri']:.6f}")
"""


@pytest.mark.skipif(sys.platform != "linux", reason="localhost cluster test")
def test_two_process_engine_train(tmp_path):
    """The full Engine train loop in a real 2-process cluster: host-sharded
    loaders in lockstep, global batch assembly, psum'd grads, cross-host
    valid-loss reduction, orbax checkpoint save from both processes."""
    sys.path.insert(0, os.path.dirname(__file__))
    from test_data import _make_corpus

    corpus = _make_corpus(tmp_path, n=9, length_range=(6000, 9000))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = tmp_path / "engine_worker.py"
    worker.write_text(_ENGINE_WORKER)
    workdir = str(tmp_path / "work")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), os.pardir)
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(pid), str(corpus),
             workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        # generous: 2 engine+eval compile sets on 2 shared CPU cores under
        # xdist contention took > 600 s once
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    lines = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
        line = [l for l in out.splitlines() if "ENGINE OK" in l]
        assert line, out[-2000:]
        lines.append(line[0].split("OK")[1])
    # identical step counts and identical (cross-host-reduced) valid loss
    assert lines[0] == lines[1], lines
