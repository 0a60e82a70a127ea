"""Worker for the 2-process multi-HOST simulation test (launched by
tests/test_multihost.py). Runs 2 data-parallel train steps on a GLOBAL
4-device mesh (2 CPU devices per process), writes loss + param norm +
process-gating evidence to a JSON file per rank.

Usage: python multihost_worker.py <pid> <nprocs> <port> <outdir>
"""

import json
import os
import sys

pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                             int(sys.argv[3]), sys.argv[4])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nprocs, process_id=pid)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import multihost_utils  # noqa: E402
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_replication_tpu.config import default_cfg  # noqa: E402
from nerf_replication_tpu.models import make_network  # noqa: E402
from nerf_replication_tpu.models.nerf.network import init_params  # noqa: E402
from nerf_replication_tpu.train import make_trainer  # noqa: E402
from nerf_replication_tpu.train.recorder import Recorder  # noqa: E402

assert jax.process_count() == nprocs
assert jax.device_count() == 2 * nprocs

cfg = default_cfg()
cfg.task_arg.update({"N_rays": 32, "N_samples": 8, "N_importance": 8})
cfg.network.nerf = {"D": 2, "W": 32, "V_D": 1, "skips": [1]}
cfg.network.xyz_encoder = {"type": "frequency", "input_dim": 3, "freq": 4}
cfg.network.dir_encoder = {"type": "frequency", "input_dim": 3, "freq": 2}
cfg.network.dtype = "float32"
cfg.record_dir = os.path.join(outdir, f"record{pid}")  # per-rank dir: only
# rank 0's may come into existence (process-0 gating)

net = make_network(cfg)
params = init_params(net, jax.random.key(0))   # same seed -> same on all
trainer = make_trainer(cfg, net)
state = trainer.init_state(params)

mesh = Mesh(np.array(jax.devices()), ("data",))
rep = NamedSharding(mesh, P())
dat = NamedSharding(mesh, P("data"))


def to_global(tree, spec):
    return jax.tree.map(
        lambda x: multihost_utils.host_local_array_to_global_array(
            np.asarray(x), mesh, spec), tree)


def global_batch(step):
    """Full deterministic global batch; each host contributes its half."""
    rng = np.random.default_rng(100 + step)
    ro = np.tile(np.array([[0.0, 0.0, 4.0]], np.float32), (32, 1))
    rd = (rng.normal(size=(32, 3)) * 0.1 +
          np.array([0.0, 0.0, -1.0])).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    colors = rng.uniform(size=(32, 3)).astype(np.float32)
    half = 32 // nprocs
    sl = slice(pid * half, (pid + 1) * half)
    return {"rays_o": ro[sl], "rays_d": rd[sl], "colors": colors[sl]}


state = to_global(jax.tree.map(np.asarray, state), P())
step_fn = jax.jit(trainer._train_step_inner,
                  in_shardings=(rep, dat, rep), out_shardings=(rep, rep))

losses = []
for step in range(2):
    batch = to_global(global_batch(step), P("data"))
    key = jax.random.key(7 + step)
    state, stats = step_fn(state, batch, key)
    losses.append(float(stats["loss"]))

pnorm = float(jnp.sqrt(sum(
    jnp.sum(jnp.square(l)) for l in jax.tree.leaves(state["params"]))))

# process-0 gating: the recorder must only touch disk on rank 0
rec = Recorder(cfg, process_index=jax.process_index())
rec.update_loss_stats({"loss": losses[-1]})
rec.record("train")
record_dir_exists = os.path.isdir(cfg.record_dir)

with open(os.path.join(outdir, f"rank{pid}.json"), "w") as f:
    json.dump({"pid": pid, "process_index": jax.process_index(),
               "losses": losses, "pnorm": pnorm,
               "record_dir_exists": record_dir_exists}, f)
