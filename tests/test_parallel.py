"""Data-parallel train step over the 8-virtual-device CPU mesh: the sharded
step must (a) run, (b) match the single-device step numerically (same batch,
deterministic ops), (c) all-reduce metrics correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    opt_w_state = opt_w.init({"shared": state.shared, "private": task.private})
    opt_pm_state = opt_pm.init({})
    return state, task, step, opt_w_state, opt_pm_state


def test_dp_step_matches_single_device(setup):
    data, cfg = setup
    x = jnp.asarray(data["train_x"][:64])
    y = jnp.asarray(data["train_y"][:64])
    rng = jax.random.PRNGKey(3)

    # single-device
    state, task, step, ows, opms = _fresh(cfg, data)
    out1 = jax.jit(step)(state.shared, {}, task.private, task.bn_state, ows,
                         opms, state.ownership, 1, x, y, rng)

    # 8-way data parallel
    state2, task2, step2, ows2, opms2 = _fresh(cfg, data)
    mesh = make_mesh()
    pstep = make_parallel_train_step(step2, mesh)
    shared = place_state(mesh, state2.shared)
    own = place_state(mesh, state2.ownership)
    priv = place_state(mesh, task2.private)
    bn = place_state(mesh, task2.bn_state)
    ows2 = place_state(mesh, ows2)
    opms2 = place_state(mesh, opms2)
    xs, ys = shard_batch(mesh, x, y)
    out8 = pstep(shared, {}, priv, bn, ows2, opms2, own, 1, xs, ys, rng, 0)

    # same math: loss/acc identical, updated weights match
    np.testing.assert_allclose(float(out1[-1]["loss"]), float(out8[-1]["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out1[-1]["acc"]), float(out8[-1]["acc"]),
                               rtol=1e-6)
    for k in out1[0]:
        np.testing.assert_allclose(np.array(out1[0][k]), np.array(out8[0][k]),
                                   rtol=2e-4, atol=2e-6)
    # BN running stats identical too (SyncBN semantics == single-device here)
    for k in out1[3]:
        np.testing.assert_allclose(np.array(out1[3][k]), np.array(out8[3][k]),
                                   rtol=2e-4, atol=2e-6)


def test_dp_step_carries_global_step(setup):
    """Annealed losses (face A-Softmax lambda) depend on the global step `it`;
    the parallel wrapper must carry the full 12-arg shared signature."""
    data, cfg = setup
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))

    from cpg_tpu.train.losses import cross_entropy

    def annealed(logits, labels, it):  # loss visibly depends on `it`
        return cross_entropy(logits, labels) + 1.0 * it

    annealed.wants_step = True
    step, (opt_w, opt_pm) = build_train_step(
        tiny_cnn, num_classes=data["num_classes"], mult=1.0,
        has_piggymask=False, cfg=cfg, loss_fn=annealed,
        augment_fn=lambda x, r: normalize01(x))
    task = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init({})
    mesh = make_mesh()
    pstep = make_parallel_train_step(step, mesh)
    shared = place_state(mesh, state.shared)
    own = place_state(mesh, state.ownership)
    priv = place_state(mesh, task.private)
    bn = place_state(mesh, task.bn_state)
    ows, opms = place_state(mesh, ows), place_state(mesh, opms)
    xs, ys = shard_batch(mesh, jnp.asarray(data["train_x"][:64]),
                         jnp.asarray(data["train_y"][:64]))
    rng = jax.random.PRNGKey(3)
    l0 = float(pstep(shared, {}, priv, bn, ows, opms, own, 1, xs, ys,
                     rng, 0)[-1]["loss"])
    # fresh states (donated above)
    state2 = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state2, "a", data["num_classes"], jax.random.PRNGKey(1))
    task2 = state2.tasks[1]
    ows2 = place_state(mesh, opt_w.init(
        {"shared": state2.shared, "private": task2.private}))
    l7 = float(pstep(place_state(mesh, state2.shared), {},
                     place_state(mesh, task2.private),
                     place_state(mesh, task2.bn_state), ows2,
                     place_state(mesh, opt_pm.init({})),
                     place_state(mesh, state2.ownership), 1, xs, ys,
                     rng, 7)[-1]["loss"])
    np.testing.assert_allclose(l7 - l0, 7.0, atol=1e-4)


def test_manager_mesh_end_to_end(setup):
    """Manager(mesh=...) — the CLI-reachable multi-device path — trains and
    evals over the 8-device mesh."""
    data, cfg = setup
    from cpg_tpu.train.manager import Manager

    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    mgr = Manager(state, tiny_cnn, 1, data, cfg, batch_size=32,
                  lr_schedule="constant",
                  augment_fn=lambda x, r: normalize01(x),
                  preprocess_fn=normalize01, mesh=make_mesh())
    res = mgr.train(epochs=6, base_lr=0.05)
    assert res.acc > 0.5, f"mesh Manager failed to learn: {res.acc}"


def test_dp_multi_step_training_progresses(setup):
    data, cfg = setup
    state, task, step, ows, opms = _fresh(cfg, data)
    mesh = make_mesh()
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
    for i in range(50):
        b = slice((i * 64) % 192, (i * 64) % 192 + 64)
        xs, ys = shard_batch(mesh, jnp.asarray(data["train_x"][b]),
                             jnp.asarray(data["train_y"][b]))
        rng, sub = jax.random.split(rng)
        shared, pm, priv, bn, ows, opms, m = pstep(
            shared, pm, priv, bn, ows, opms, own, 1, xs, ys, sub, i)
        losses.append(float(m["loss"]))
    tail = sum(losses[-5:]) / 5
    assert tail < losses[0] * 0.6, f"no learning under DP: {losses}"


def test_dp_step_with_remat_policy_matches(setup):
    """remat_policy='convs' must compose with the mesh-parallel wrapper and
    reproduce the plain parallel step's numerics exactly."""
    import dataclasses

    data, cfg = setup
    x = jnp.asarray(data["train_x"][:64])
    y = jnp.asarray(data["train_y"][:64])
    rng = jax.random.PRNGKey(3)
    mesh = make_mesh()

    outs = []
    for c in (cfg, dataclasses.replace(cfg, remat_policy="convs")):
        state, task, step, ows, opms = _fresh(c, data)
        pstep = make_parallel_train_step(step, mesh)
        shared = place_state(mesh, state.shared)
        own = place_state(mesh, state.ownership)
        priv = place_state(mesh, task.private)
        bn = place_state(mesh, task.bn_state)
        ows, opms = place_state(mesh, ows), place_state(mesh, opms)
        xs, ys = shard_batch(mesh, x, y)
        outs.append(pstep(shared, {}, priv, bn, ows, opms, own, 1, xs, ys,
                          rng, 0))
    plain, sel = outs
    np.testing.assert_array_equal(np.array(plain[-1]["loss"]),
                                  np.array(sel[-1]["loss"]))
    for k in plain[0]:
        np.testing.assert_array_equal(np.array(plain[0][k]),
                                      np.array(sel[0][k]))
