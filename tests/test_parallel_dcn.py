"""Hierarchical (dcn, data, model) pod mesh: the multi-host layout must run
the full train step with identical numerics to single-device — the dcn axis
only changes WHERE the batch rows live and which links the all-reduce rides,
never the math (SURVEY §5 distributed row; the reference has no multi-host)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.parallel.distributed import (local_batch_slice, make_pod_mesh,
                                          put_global_batch)
from cpg_tpu.parallel.mesh import (make_mesh, make_parallel_train_step,
                                   place_state, shard_batch)
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step

from .helpers import normalize01, synthetic_task, tiny_cnn


@pytest.fixture(scope="module")
def setup():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    return data, cfg


def _fresh(cfg, data):
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    step, (opt_w, opt_pm) = build_train_step(
        tiny_cnn, num_classes=data["num_classes"], mult=1.0,
        has_piggymask=False, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x),
    )
    task = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    return state, task, step, ows, {}


def test_dcn_mesh_axes_and_batch_sharding():
    mesh = make_mesh(n_dcn=2, n_model=2)
    assert mesh.axis_names == ("dcn", "data", "model")
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    from cpg_tpu.parallel.mesh import batch_sharding

    spec = batch_sharding(mesh).spec
    assert tuple(spec) == (("dcn", "data"),)


def test_dcn_step_matches_single_device(setup):
    data, cfg = setup
    x = jnp.asarray(data["train_x"][:64])
    y = jnp.asarray(data["train_y"][:64])
    rng = jax.random.PRNGKey(3)

    state, task, step, ows, opms = _fresh(cfg, data)
    out1 = jax.jit(step)(state.shared, {}, task.private, task.bn_state, ows,
                         opms, state.ownership, 1, x, y, rng)

    state2, task2, step2, ows2, opms2 = _fresh(cfg, data)
    mesh = make_mesh(n_dcn=2, n_model=2)  # 2 "hosts" x 2 data x 2 model
    pstep = make_parallel_train_step(step2, mesh)
    shared = place_state(mesh, state2.shared)
    own = place_state(mesh, state2.ownership)
    priv = place_state(mesh, task2.private)
    bn = place_state(mesh, task2.bn_state)
    ows2 = place_state(mesh, ows2)
    opms2 = place_state(mesh, opms2)
    xs, ys = shard_batch(mesh, x, y)
    # batch rows spread over dcn*data = 4 groups of devices
    assert len(xs.sharding.device_set) == 8
    out8 = pstep(shared, {}, priv, bn, ows2, opms2, own, 1, xs, ys, rng, 0)

    np.testing.assert_allclose(float(out1[-1]["loss"]),
                               float(out8[-1]["loss"]), rtol=1e-5)
    for k in out1[0]:
        np.testing.assert_allclose(np.array(out1[0][k]), np.array(out8[0][k]),
                                   rtol=2e-4, atol=2e-6)
    for k in out1[3]:
        np.testing.assert_allclose(np.array(out1[3][k]), np.array(out8[3][k]),
                                   rtol=2e-4, atol=2e-6)


def test_pod_mesh_single_process_fallback(setup):
    """make_pod_mesh degrades to the local 2-axis mesh with one process, and
    put_global_batch places a host batch onto it."""
    data, _ = setup
    mesh = make_pod_mesh()
    assert "dcn" not in mesh.axis_names  # single process -> no dcn axis
    sl = local_batch_slice(mesh, 64)
    assert (sl.start, sl.stop) == (0, 64)
    x = np.asarray(data["train_x"][:64])
    y = np.asarray(data["train_y"][:64])
    gx, gy = put_global_batch(mesh, x, y)
    assert gx.shape == (64, *x.shape[1:]) and gy.shape == (64,)
    np.testing.assert_array_equal(np.asarray(gx), x)


def test_pod_mesh_explicit_dcn_training_progresses(setup):
    """Loss decreases over steps on the explicit (2,2,2) pod mesh — the full
    donated train loop survives the hierarchical layout."""
    data, cfg = setup
    state, task, step, ows, opms = _fresh(cfg, data)
    mesh = make_pod_mesh(n_model=2, n_dcn=2)
    pstep = make_parallel_train_step(step, mesh)
    shared = place_state(mesh, state.shared)
    own = place_state(mesh, state.ownership)
    priv = place_state(mesh, task.private)
    bn = place_state(mesh, task.bn_state)
    ows = place_state(mesh, ows)
    opms = place_state(mesh, opms)
    pm = {}
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        b = slice((i * 64) % 192, (i * 64) % 192 + 64)
        xs, ys = shard_batch(mesh, jnp.asarray(data["train_x"][b]),
                             jnp.asarray(data["train_y"][b]))
        rng, sub = jax.random.split(rng)
        shared, pm, priv, bn, ows, opms, m = pstep(
            shared, pm, priv, bn, ows, opms, own, 1, xs, ys, sub, i)
        losses.append(float(m["loss"]))
    assert sum(losses[-5:]) / 5 < losses[0] * 0.7, losses
