"""Production wiring of the fused BN+ReLU+conv chain
(TrainConfig.use_fused_chain -> Ctx.fused_chain -> fused_bn_relu_sconv):
train and eval steps must match the default unfused path numerically, and
the VGG16 forward must be param-compatible across both paths."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.models import REGISTRY, framework as fw
from cpg_tpu.models.framework import (batchnorm, fused_bn_relu_sconv, head,
                                      maxpool, relu, sconv)
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step, build_eval_step

from .helpers import normalize01, synthetic_task


def tiny_vgg(ctx, x, num_classes, mult=1.0):
    """Two chained 3x3 convs per block — the VGG fusion structure in small."""
    c1, c2 = max(1, int(8 * mult)), max(1, int(16 * mult))
    x = sconv(ctx, "features/conv0", x, c1, kernel=3)
    x = fused_bn_relu_sconv(ctx, "features/bn0", "features/conv1", x, c1)
    x = maxpool(relu(batchnorm(ctx, "features/bn1", x)))
    x = sconv(ctx, "features/conv2", x, c2, kernel=3)
    x = fused_bn_relu_sconv(ctx, "features/bn2", "features/conv3", x, c2)
    x = maxpool(relu(batchnorm(ctx, "features/bn3", x)))
    x = x.reshape(x.shape[0], -1)
    return head(ctx, "classifier", x, num_classes)


if "tiny_vgg" not in REGISTRY:
    REGISTRY["tiny_vgg"] = (tiny_vgg, (8, 8, 3))


def _two_task_state():
    from cpg_tpu.core.pruner import one_shot_prune

    state = init_state("tiny_vgg", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "b", 4, jax.random.PRNGKey(2))
    return state


def _run_steps(cfg, n_steps=3):
    state = _two_task_state()
    task = state.tasks[2]
    step, (opt_w, opt_pm) = build_train_step(
        tiny_vgg, num_classes=4, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x))
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(task.piggymask)
    data = synthetic_task(0, hw=8)
    shared, pm = state.shared, task.piggymask
    priv, bn = task.private, task.bn_state
    losses = []
    jstep = jax.jit(step)
    for i in range(n_steps):
        x = jnp.asarray(data["train_x"][i * 16:(i + 1) * 16])
        y = jnp.asarray(data["train_y"][i * 16:(i + 1) * 16])
        shared, pm, priv, bn, ows, opms, m = jstep(
            shared, pm, priv, bn, ows, opms, state.ownership, 2, x, y,
            jax.random.PRNGKey(7), i)
        losses.append(float(m["loss"]))
    return losses, shared, pm, priv, bn


def test_fused_chain_train_step_matches_default():
    cfg0 = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)
    cfg1 = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32,
                       use_fused_chain=True)
    l0, sh0, pm0, pr0, bn0 = _run_steps(cfg0)
    l1, sh1, pm1, pr1, bn1 = _run_steps(cfg1)
    np.testing.assert_allclose(l0, l1, rtol=1e-5, atol=1e-6)
    for k in sh0:
        np.testing.assert_allclose(np.array(sh0[k]), np.array(sh1[k]),
                                   rtol=1e-4, atol=1e-6, err_msg=k)
    for k in pm0:
        np.testing.assert_allclose(np.array(pm0[k]), np.array(pm1[k]),
                                   rtol=1e-4, atol=1e-7, err_msg=k)
    for k in bn0:  # running stats go through batchnorm_affine's update path
        np.testing.assert_allclose(np.array(bn0[k]), np.array(bn1[k]),
                                   rtol=1e-5, atol=1e-7, err_msg=k)


def test_fused_chain_eval_matches_default():
    state = _two_task_state()
    task = state.tasks[2]
    data = synthetic_task(0, hw=8)
    x = jnp.asarray(data["test_x"][:16])
    y = jnp.asarray(data["test_y"][:16])
    outs = []
    for fused in (False, True):
        cfg = TrainConfig(compute_dtype=jnp.float32, use_fused_chain=fused)
        ev = jax.jit(build_eval_step(
            tiny_vgg, num_classes=4, mult=1.0, has_piggymask=True,
            cfg=cfg, preprocess_fn=normalize01))
        logits, metrics = ev(state.shared, task.piggymask, task.private,
                             task.bn_state, state.ownership, 2, x, y)
        outs.append((np.array(logits), int(metrics["acc_sum"])))
    np.testing.assert_allclose(outs[0][0], outs[1][0], rtol=1e-4, atol=1e-5)
    assert outs[0][1] == outs[1][1]


def test_vgg16_forward_param_compatible_and_close():
    """The restructured vgg16_bn_cifar registers the same params as before
    (checkpoint compatibility) and its fused forward matches unfused."""
    rng = jax.random.PRNGKey(0)
    from cpg_tpu.models import get_model

    model_fn, in_shape = get_model("vgg16_bn_cifar")
    x = jax.random.normal(rng, (4, *in_shape), jnp.float32)
    shared, private, bn = fw.init(rng, model_fn, x, num_classes=10)
    # the classic names survive the restructure
    assert "features/conv12/kernel" in shared
    assert "features/bn12/scale" in private
    y0, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                     num_classes=10)
    y1, nbn1 = fw.apply(model_fn, shared, private, bn, x, train=False,
                        num_classes=10, fused_chain=True)
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=1e-4, atol=1e-4)
    # train-mode BN running updates agree too
    _, nbn0 = fw.apply(model_fn, shared, private, bn, x, train=True,
                       num_classes=10)
    _, nbn1 = fw.apply(model_fn, shared, private, bn, x, train=True,
                       num_classes=10, fused_chain=True)
    for k in nbn0:
        np.testing.assert_allclose(np.array(nbn0[k]), np.array(nbn1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_resnet50_forward_param_compatible_and_close():
    """ResNet-50's stride-1 bottleneck 3x3s route through
    fused_bn_relu_sconv: same param names (checkpoint compatibility with the
    torch converter), fused forward matches unfused. Small input so late
    stages (h<3) exercise the kernel's XLA fallback too."""
    rng = jax.random.PRNGKey(3)
    from cpg_tpu.models import get_model

    model_fn, _ = get_model("resnet50")
    x = jax.random.normal(rng, (2, 64, 64, 3), jnp.float32)
    shared, private, bn = fw.init(rng, model_fn, x, num_classes=6)
    # torch-converter naming survives the fused-chain restructure
    assert "layer1/block0/conv2/kernel" in shared
    assert "layer3/block1/conv2/kernel" in shared
    assert "layer1/block0/bn1/scale" in private
    y0, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                     num_classes=6)
    y1, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                     num_classes=6, fused_chain=True)
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=1e-4, atol=1e-4)
    _, nbn0 = fw.apply(model_fn, shared, private, bn, x, train=True,
                       num_classes=6)
    _, nbn1 = fw.apply(model_fn, shared, private, bn, x, train=True,
                       num_classes=6, fused_chain=True)
    for k in nbn0:
        # deeper than VGG: downstream BNs see f32-reassociated upstream
        # outputs, so batch-stat drift compounds slightly (cf. the growth
        # drift policy in SequenceConfig.verify_growth)
        np.testing.assert_allclose(np.array(nbn0[k]), np.array(nbn1[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)


def test_fused_chain_on_data_mesh_matches_default():
    """The Pallas fused chain composes with the GSPMD data-parallel step:
    same loss as the default path on a 4-way batch-sharded mesh. (Perf under
    sharding is a separate hardware question; this pins correctness.)"""
    from cpg_tpu.parallel.mesh import (make_mesh, make_parallel_train_step,
                                       shard_batch)
    from cpg_tpu.train.sequence import snapshot

    state0 = _two_task_state()
    data = synthetic_task(0, hw=8)
    x = jnp.asarray(data["train_x"][:32])
    y = jnp.asarray(data["train_y"][:32])
    losses = []
    for fused in (False, True):
        state = snapshot(state0)  # pstep donates; never reuse donated inputs
        task = state.tasks[2]
        cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32,
                          use_fused_chain=fused)
        step, (ow, opm) = build_train_step(
            tiny_vgg, num_classes=4, mult=1.0, has_piggymask=True, cfg=cfg,
            augment_fn=lambda x, r: normalize01(x))
        mesh = make_mesh(n_data=4)
        pstep = make_parallel_train_step(step, mesh)
        ows = ow.init({"shared": state.shared, "private": task.private})
        opms = opm.init(task.piggymask)
        xb, yb = shard_batch(mesh, x, y)
        out = pstep(state.shared, task.piggymask, task.private,
                    task.bn_state, ows, opms, state.ownership, 2, xb, yb,
                    jax.random.PRNGKey(7), 0)
        losses.append(float(out[-1]["loss"]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5, atol=1e-6)
