"""Gradient clipping: a divergent configuration stays finite with clipping."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step, set_lr

from .helpers import normalize01, synthetic_task, tiny_cnn


def _run(cfg, steps=12):
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    step, (opt_w, opt_pm) = build_train_step(
        tiny_cnn, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x))
    t = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": t.private})
    opms = opt_pm.init({})
    js = jax.jit(step)
    shared, pm, priv, bn = state.shared, {}, t.private, t.bn_state
    for i in range(steps):
        b = slice((i * 32) % 224, (i * 32) % 224 + 32)
        shared, pm, priv, bn, ows, opms, m = js(
            shared, pm, priv, bn, ows, opms, state.ownership, 1,
            jnp.asarray(data["train_x"][b]), jnp.asarray(data["train_y"][b]),
            jax.random.PRNGKey(i), i)
    finite = all(bool(jnp.all(jnp.isfinite(w))) for w in jax.tree.leaves(shared))
    return float(m["loss"]), finite


def _one_step_update_norm(cfg):
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    step, (opt_w, opt_pm) = build_train_step(
        tiny_cnn, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x))
    t = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": t.private})
    opms = opt_pm.init({})
    before = jax.tree.map(lambda a: a.copy(), state.shared)
    out = jax.jit(step)(
        state.shared, {}, t.private, t.bn_state, ows, opms, state.ownership,
        1, jnp.asarray(data["train_x"][:32]),
        jnp.asarray(data["train_y"][:32]), jax.random.PRNGKey(0), 0)
    deltas = jax.tree.map(lambda a, b: a - b, out[0], before)
    return float(jnp.sqrt(sum(jnp.sum(d ** 2)
                              for d in jax.tree.leaves(deltas))))


def test_clip_bounds_the_update():
    # global-norm clip C with lr L and no momentum history bounds the shared
    # update norm by L * C (private params excluded from this norm => <=)
    wild = TrainConfig(lr=10.0, compute_dtype=jnp.float32, momentum=0.0)
    n_unclipped = _one_step_update_norm(wild)
    clip = 1e-3  # far below the raw grad norm so the clip binds
    clipped = dataclasses.replace(wild, grad_clip_norm=clip)
    n_clipped = _one_step_update_norm(clipped)
    assert n_unclipped > 10.0 * clip * 2, n_unclipped  # clip binds
    assert n_clipped <= 10.0 * clip + 1e-5, n_clipped
    # a divergy config stays finite when clipped
    loss_c, finite_c = _run(dataclasses.replace(
        TrainConfig(lr=200.0, compute_dtype=jnp.float32), grad_clip_norm=1.0))
    assert finite_c and np.isfinite(loss_c)


def test_set_lr_still_works_with_clip_chain():
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32,
                      grad_clip_norm=1.0)
    from cpg_tpu.train.step import make_optimizers

    opt_w, _ = make_optimizers(cfg)
    s = opt_w.init({"w": jnp.ones(3)})
    s = set_lr(s, 0.001)
    assert abs(float(s.hyperparams["learning_rate"]) - 0.001) < 1e-9
