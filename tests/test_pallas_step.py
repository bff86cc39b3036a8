"""Production-path Pallas wiring: the fused train/eval step
(TrainConfig.use_pallas / use_pallas_conv) must match the default
materialize-then-compute path numerically — same losses, same updated
weights, same eval logits (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.models import REGISTRY, framework as fw
from cpg_tpu.models.framework import batchnorm, head, relu, sconv, sdense
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step, build_eval_step

from .helpers import normalize01, synthetic_task


def tiny_mlp_cnn(ctx, x, num_classes, mult=1.0):
    """conv + dense trunk: exercises BOTH fused kernels (sconv + sdense)."""
    c = max(1, int(8 * mult))
    x = sconv(ctx, "features/conv0", x, c, kernel=3)
    x = batchnorm(ctx, "features/bn0", x)
    x = relu(x)
    x = x.reshape(x.shape[0], -1)
    x = sdense(ctx, "fc1", x, max(1, int(32 * mult)))
    x = relu(x)
    return head(ctx, "classifier", x, num_classes)


if "tiny_mlp_cnn" not in REGISTRY:
    REGISTRY["tiny_mlp_cnn"] = (tiny_mlp_cnn, (8, 8, 3))


def _two_task_state():
    from cpg_tpu.core.pruner import one_shot_prune

    state = init_state("tiny_mlp_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "b", 4, jax.random.PRNGKey(2))
    return state


def _run_steps(cfg, n_steps=3):
    state = _two_task_state()
    task = state.tasks[2]
    step, (opt_w, opt_pm) = build_train_step(
        tiny_mlp_cnn, num_classes=4, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x))
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(task.piggymask)
    data = synthetic_task(0, hw=8)
    shared, pm = state.shared, task.piggymask
    priv, bn = task.private, task.bn_state
    own = state.ownership
    losses = []
    jstep = jax.jit(step)
    for i in range(n_steps):
        x = jnp.asarray(data["train_x"][i * 16:(i + 1) * 16])
        y = jnp.asarray(data["train_y"][i * 16:(i + 1) * 16])
        shared, pm, priv, bn, ows, opms, m = jstep(
            shared, pm, priv, bn, ows, opms, own, 2, x, y,
            jax.random.PRNGKey(7), i)
        losses.append(float(m["loss"]))
    return losses, shared, pm, priv, state, own


def test_fused_train_step_matches_default():
    cfg0 = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)
    cfg1 = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32,
                       use_pallas=True, use_pallas_conv=True)
    l0, sh0, pm0, pr0, _, _ = _run_steps(cfg0)
    l1, sh1, pm1, pr1, _, _ = _run_steps(cfg1)
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-6)
    for k in sh0:
        np.testing.assert_allclose(np.array(sh0[k]), np.array(sh1[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    for k in pm0:
        np.testing.assert_allclose(np.array(pm0[k]), np.array(pm1[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)
    for k in pr0:
        np.testing.assert_allclose(np.array(pr0[k]), np.array(pr1[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)


def test_fused_eval_step_matches_default():
    state = _two_task_state()
    task = state.tasks[2]
    data = synthetic_task(0, hw=8)
    x = jnp.asarray(data["test_x"][:16])
    y = jnp.asarray(data["test_y"][:16])
    outs = []
    for fused in (False, True):
        cfg = TrainConfig(compute_dtype=jnp.float32, use_pallas=fused,
                          use_pallas_conv=fused)
        ev = jax.jit(build_eval_step(
            tiny_mlp_cnn, num_classes=4, mult=1.0, has_piggymask=True,
            cfg=cfg, preprocess_fn=normalize01))
        logits, metrics = ev(state.shared, task.piggymask, task.private,
                             task.bn_state, state.ownership, 2, x, y)
        outs.append((np.array(logits), int(metrics["acc_sum"])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-5)
    assert outs[0][1] == outs[1][1]


def test_fused_task1_no_piggymask_falls_back():
    """Task 1 has no piggymask: the fused flags must still work (per-layer
    XLA select path) and match the default."""
    data = synthetic_task(0, hw=8)
    outs = []
    for fused in (False, True):
        state = init_state("tiny_mlp_cnn", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        task = state.tasks[1]
        cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32,
                          use_pallas=fused, use_pallas_conv=fused)
        step, (opt_w, opt_pm) = build_train_step(
            tiny_mlp_cnn, num_classes=4, mult=1.0, has_piggymask=False,
            cfg=cfg, augment_fn=lambda x, r: normalize01(x))
        ows = opt_w.init({"shared": state.shared, "private": task.private})
        out = jax.jit(step)(
            state.shared, {}, task.private, task.bn_state, ows,
            opt_pm.init({}), state.ownership, 1,
            jnp.asarray(data["train_x"][:16]),
            jnp.asarray(data["train_y"][:16]), jax.random.PRNGKey(3), 0)
        outs.append(out)
    np.testing.assert_allclose(float(outs[0][-1]["loss"]),
                               float(outs[1][-1]["loss"]), rtol=1e-6)
    for k in outs[0][0]:
        np.testing.assert_allclose(np.array(outs[0][0][k]),
                                   np.array(outs[1][0][k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)
