"""Worker for test_multihost.py: one process of a 2-process CPU 'pod'.

Run as:  python tests/_mh_worker.py <process_id> <port> <out_json> [mode]

Each process owns 4 virtual CPU devices; together they form the hierarchical
(dcn=2, data=2, model=2) mesh from parallel/distributed.make_pod_mesh.

mode "raw" (default): both feed their local slice of the SAME deterministic
global batch, run 3 CPG train steps via the hand-wired step, and dump final
loss + shared-param checksums.

mode "manager": the PRODUCTION path — Manager(..., mesh=pod_mesh) trains one
epoch (local-slice batch feeding through DevicePrefetcher's
make_array_from_process_local_data) and evaluates via the device-side
acc_sum reduction. Dumps loss, eval acc, and shared-param checksums.
The parent test compares both against single-process ground truth.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

import jax

jax.config.update("jax_platforms", "cpu")

pid, port, out_path = int(sys.argv[1]), sys.argv[2], sys.argv[3]
mode = sys.argv[4] if len(sys.argv) > 4 else "raw"

# through the production wrapper (ADVICE r2 #1: must initialize for real,
# not silently fall back — asserted below)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cpg_tpu.parallel.distributed import initialize

initialize(coordinator_address=f"127.0.0.1:{port}", num_processes=2,
           process_id=pid)
assert jax.process_count() == 2, "initialize() fell back to single-host"

import jax.numpy as jnp
import numpy as np

from cpg_tpu.parallel.distributed import (local_batch_slice, make_pod_mesh,
                                          put_global_batch)
from cpg_tpu.parallel.mesh import make_parallel_train_step, place_state
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step
from tests.helpers import norm_augment, normalize01, synthetic_task, tiny_cnn

data = synthetic_task(0)
cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
state = init_state("tiny_cnn", jax.random.PRNGKey(0))
start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
task = state.tasks[1]

mesh = make_pod_mesh(n_model=2)
assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}, mesh.shape

if mode == "manager":
    from cpg_tpu.train.manager import Manager

    mgr = Manager(state, tiny_cnn, 1, data, cfg, batch_size=64,
                  augment_fn=norm_augment, preprocess_fn=normalize01,
                  seed=5, lr_schedule="constant", mesh=mesh)
    res = mgr.train(1)
    sums = {k: float(jnp.sum(v).astype(jnp.float64))
            for k, v in state.shared.items()}
    with open(out_path, "w") as f:
        json.dump({"process": pid, "loss": res.loss, "acc": res.acc,
                   "param_sums": sums}, f)
    print(f"proc {pid} OK manager loss={res.loss} acc={res.acc}", flush=True)
    sys.exit(0)

step, (opt_w, opt_pm) = build_train_step(
    tiny_cnn, num_classes=data["num_classes"], mult=1.0, has_piggymask=False,
    cfg=cfg, augment_fn=lambda x, r: normalize01(x))
ows = opt_w.init({"shared": state.shared, "private": task.private})

pstep = make_parallel_train_step(step, mesh)
shared = place_state(mesh, state.shared)
own = place_state(mesh, state.ownership)
priv = place_state(mesh, task.private)
bn = place_state(mesh, task.bn_state)
ows = place_state(mesh, ows)
opms = place_state(mesh, opt_pm.init({}))

sl = local_batch_slice(mesh, 64)
pm, rng = {}, jax.random.PRNGKey(3)
loss = None
for i in range(3):
    x = np.asarray(data["train_x"][i * 64:(i + 1) * 64])
    y = np.asarray(data["train_y"][i * 64:(i + 1) * 64])
    gx, gy = put_global_batch(mesh, x[sl], y[sl])
    rng, sub = jax.random.split(rng)
    shared, pm, priv, bn, ows, opms, m = pstep(
        shared, pm, priv, bn, ows, opms, own, 1, gx, gy, sub, i)
    loss = float(m["loss"])

# shared params: fully-replicated sums are identical on every process
sums = {k: float(jnp.sum(v).astype(jnp.float64)) for k, v in shared.items()}
with open(out_path, "w") as f:
    json.dump({"process": pid, "loss": loss, "param_sums": sums}, f)
print(f"proc {pid} OK loss={loss}", flush=True)
