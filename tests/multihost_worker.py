"""Multi-host worker for tests/test_multihost.py — NOT a pytest module.

Runs one true multi-process data-parallel A2J train step: N host processes
x 4 virtual CPU devices each -> one global ``data`` mesh, gloo collectives,
per-process input shards. This exercises the real multi-host entry
(`runtime.setup` reading COORDINATOR_ADDRESS / PROCESS_ID / NUM_PROCESSES
and `runtime.process_shard`) that replaces the reference's latent DDP
(config/a2j.yaml:5 strategy stub + DistributedSampler, utils/utils.py:53)
— the same recipe the README's "multi-host pods" section documents, executed
for real across processes instead of only unit-testing the shard math.

Usage: python multihost_worker.py PORT PROCESS_ID NUM_PROCESSES
Prints "MHLOSS <float>" and "MHOK" on success; the spawning test compares
the loss against a single-process run of the identical global batch.
"""

import os
import sys

import jax

PORT, PID, NPROCS = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
LOCAL_DEVICES = 4

# platform + device count must be set before first backend use (the
# environment's sitecustomize pins jax_platforms at interpreter start, so
# config updates — not env vars — are required, like tests/conftest.py)
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
os.environ["COORDINATOR_ADDRESS"] = f"127.0.0.1:{PORT}"
os.environ["PROCESS_ID"] = str(PID)
os.environ["NUM_PROCESSES"] = str(NPROCS)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from handnet_tpu import runtime  # noqa: E402

runtime.setup()  # initializes jax.distributed from the env triple

assert jax.process_count() == NPROCS, jax.process_count()
assert runtime.process_shard() == (PID, NPROCS)
n_global = len(jax.devices())
assert n_global == LOCAL_DEVICES * NPROCS, n_global

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import PartitionSpec as P  # noqa: E402

from handnet_tpu.config import A2JConfig, TrainConfig  # noqa: E402
from handnet_tpu.parallel.mesh import create_mesh  # noqa: E402
from handnet_tpu.train.trainer import A2JTrainer  # noqa: E402

mesh = create_mesh(n_global)
trainer = A2JTrainer(A2JConfig(crop_h=32, crop_w=32, num_joints=3),
                     TrainConfig(bf16=False), mesh=mesh, steps_per_epoch=10)
# same seed on every process -> identical replicated initial state
state = trainer.init_state(jax.random.PRNGKey(0))

# the SAME global batch the single-process comparison builds (seed 0); this
# process contributes only its contiguous row-shard, exactly what a
# PrefetchLoader(shard_id=process_index, num_shards=process_count) feeds
rng = np.random.default_rng(0)
g_image = rng.normal(size=(n_global, 32, 32, 1)).astype(np.float32)
g_uvd = rng.uniform(0, 32, size=(n_global, 3, 3)).astype(np.float32)
rows = slice(PID * LOCAL_DEVICES, (PID + 1) * LOCAL_DEVICES)
batch = {
    "image": multihost_utils.host_local_array_to_global_array(
        g_image[rows], mesh, P("data")),
    "jt_uvd": multihost_utils.host_local_array_to_global_array(
        g_uvd[rows], mesh, P("data")),
}

state, metrics = trainer.train_step(state, batch)
jax.block_until_ready(metrics["total_loss"])
loss = float(np.asarray(metrics["total_loss"].addressable_data(0)))
assert np.isfinite(loss)
print(f"MHLOSS {loss!r}", flush=True)
print("MHOK", flush=True)
