"""REAL multi-process validation of the pod (DCN) path: two OS processes,
each owning 4 virtual CPU devices, form the (dcn=2, data=2, model=2) mesh via
jax.distributed + make_pod_mesh and train 3 CPG steps on their local batch
slices. Numerics must match the single-process ground truth exactly — the
multi-host layer only moves data, never the math.

This is the closest an 8-vCPU box gets to a 2-host TPU pod: same controller
topology (one process per host), same global-array assembly
(make_array_from_process_local_data), same hierarchical mesh.
"""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step

from .helpers import normalize01, synthetic_task, tiny_cnn

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def _ground_truth():
    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    step, (opt_w, opt_pm) = build_train_step(
        tiny_cnn, num_classes=data["num_classes"], mult=1.0,
        has_piggymask=False, cfg=cfg, augment_fn=lambda x, r: normalize01(x))
    task = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    shared, pm, priv, bn = state.shared, {}, task.private, task.bn_state
    opms, rng = opt_pm.init({}), jax.random.PRNGKey(3)
    jstep = jax.jit(step)
    loss = None
    for i in range(3):
        x = jnp.asarray(data["train_x"][i * 64:(i + 1) * 64])
        y = jnp.asarray(data["train_y"][i * 64:(i + 1) * 64])
        rng, sub = jax.random.split(rng)
        shared, pm, priv, bn, ows, opms, m = jstep(
            shared, pm, priv, bn, ows, opms, state.ownership, 1, x, y, sub, i)
        loss = float(m["loss"])
    sums = {k: float(jnp.sum(v)) for k, v in shared.items()}
    return loss, sums


def test_two_process_pod_matches_single_process(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"mh{i}.json") for i in (0, 1)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests", "_mh_worker.py"),
             str(i), str(port), outs[i]],
            cwd=_REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in (0, 1)
    ]
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"

    results = [json.load(open(o)) for o in outs]
    loss_gt, sums_gt = _ground_truth()
    for r in results:
        np.testing.assert_allclose(r["loss"], loss_gt, rtol=1e-5)
        for k, v in sums_gt.items():
            np.testing.assert_allclose(r["param_sums"][k], v, rtol=1e-4,
                                       atol=1e-6)
    # both processes agree bit-for-bit on the replicated view
    assert results[0]["param_sums"] == results[1]["param_sums"]


def test_two_process_pod_manager_path(tmp_path):
    """The PRODUCTION Manager path on a 2-process pod mesh: local-slice batch
    feeding (make_array_from_process_local_data via DevicePrefetcher),
    TP-sharded state, device-side eval reduction. Must reproduce the
    single-process Manager's numerics (ADVICE r2 #2: Manager previously
    device_put the local copy as if it were the global batch)."""
    from cpg_tpu.train.manager import Manager
    from cpg_tpu.train.step import TrainConfig as TC

    port = _free_port()
    outs = [str(tmp_path / f"mgr{i}.json") for i in (0, 1)]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_REPO, "tests", "_mh_worker.py"),
             str(i), str(port), outs[i], "manager"],
            cwd=_REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in (0, 1)
    ]
    logs = [p.communicate(timeout=540)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-3000:]}"

    # single-process ground truth through the same Manager surface
    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    from tests.helpers import norm_augment, normalize01
    mgr = Manager(state, tiny_cnn, 1, data, cfg, batch_size=64,
                  augment_fn=norm_augment, preprocess_fn=normalize01,
                  seed=5, lr_schedule="constant")
    res = mgr.train(1)
    sums_gt = {k: float(jnp.sum(v)) for k, v in state.shared.items()}

    results = [json.load(open(o)) for o in outs]
    for r in results:
        np.testing.assert_allclose(r["loss"], res.loss, rtol=1e-5)
        np.testing.assert_allclose(r["acc"], res.acc, atol=1e-9)
        for k, v in sums_gt.items():
            np.testing.assert_allclose(r["param_sums"][k], v, rtol=1e-4,
                                       atol=1e-6)
    assert results[0]["param_sums"] == results[1]["param_sums"]
