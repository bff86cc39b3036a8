"""Model zoo: shapes, param partitioning, width scaling, angle head math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.models import framework as fw, get_model
from cpg_tpu.models.spherenet import spherenet20
from cpg_tpu.models.vgg import vgg16_bn_cifar
from cpg_tpu.train.losses import make_angle_loss


def test_vgg16_shapes_and_partition():
    model_fn, in_shape = get_model("vgg16_bn_cifar")
    x = jnp.zeros((2, *in_shape))
    shared, private, bn = fw.init(jax.random.PRNGKey(0), model_fn, x,
                                  num_classes=5, mult=1.0)
    assert len(shared) == 13  # 13 sharable convs
    assert all(k.endswith("/kernel") for k in shared)
    # head + BN affine are private
    assert "classifier/kernel" in private and "features/bn0/scale" in private
    assert shared["features/conv0/kernel"].shape == (3, 3, 3, 64)
    y, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                    num_classes=5, mult=1.0)
    assert y.shape == (2, 5)


def test_vgg16_width_multiplier():
    model_fn, in_shape = get_model("vgg16_bn_cifar")
    x = jnp.zeros((1, *in_shape))
    shared, _, _ = fw.init(jax.random.PRNGKey(0), model_fn, x, num_classes=5,
                           mult=1.5)
    assert shared["features/conv0/kernel"].shape == (3, 3, 3, 96)
    assert shared["features/conv12/kernel"].shape[-1] == 768


def test_resnet50_shapes():
    model_fn, _ = get_model("resnet50")
    x = jnp.zeros((2, 64, 64, 3))  # global pool makes input size flexible
    shared, private, bn = fw.init(jax.random.PRNGKey(0), model_fn, x,
                                  num_classes=7, mult=1.0)
    # 1 stem + 16 blocks * 3 convs + 4 downsample convs = 53 sharable kernels
    assert len(shared) == 53
    assert shared["conv1/kernel"].shape == (7, 7, 3, 64)
    assert shared["layer4/block2/conv3/kernel"].shape == (1, 1, 512, 2048)
    y, newbn = fw.apply(model_fn, shared, private, bn, x, train=True,
                        num_classes=7, mult=1.0)
    assert y.shape == (2, 7)
    assert len(newbn) > 0


def test_spherenet_shapes_and_heads():
    model_fn, in_shape = get_model("spherenet20")
    x = jnp.zeros((2, *in_shape))
    shared, private, bn = fw.init(jax.random.PRNGKey(0), model_fn, x,
                                  num_classes=11, mult=1.0,
                                  head_type="angle")
    # 4 stage-down convs + (1+2+4+1)*2 unit convs + fc5 = 21 sharable kernels
    assert len(shared) == 21
    assert shared["fc5/kernel"].shape == (7 * 6 * 512, 512)
    out, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                      num_classes=11, mult=1.0, head_type="angle")
    cos, phi = out
    assert cos.shape == (2, 11) and phi.shape == (2, 11)
    emb, _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                      num_classes=11, mult=1.0, head_type="none")
    assert emb.shape == (2, 512)
    # PReLU slopes are task-private
    assert "stage1/down_prelu/slope" in private


def test_angle_head_math():
    """phi = (-1)^k cos(4t) - 2k must be monotone-decreasing in theta and
    below cos(theta) (the margin)."""
    model_fn, in_shape = get_model("spherenet20")
    x = jnp.asarray(np.random.RandomState(0).randn(4, *in_shape), jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(1), model_fn, x,
                                  num_classes=6, mult=1.0, head_type="angle")
    (cos, phi), _ = fw.apply(model_fn, shared, private, bn, x, train=False,
                             num_classes=6, mult=1.0, head_type="angle")
    assert np.all(np.array(phi) <= np.array(cos) + 1e-4)  # margin property


def test_angle_loss_annealing():
    loss = make_angle_loss()
    assert loss.wants_step
    rng = np.random.RandomState(0)
    cos = jnp.asarray(rng.randn(8, 5).astype(np.float32))
    phi = cos - 1.0
    y = jnp.asarray(rng.randint(0, 5, 8))
    early = float(loss((cos, phi), y, 0))
    late = float(loss((cos, phi), y, 100000))
    # late training weights the (harder) phi term more -> larger loss here
    assert late > early
