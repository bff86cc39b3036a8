"""Invariant auditor + pretrained task-1 adoption (fine-grained config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.core.invariants import InvariantViolation, check_state
from cpg_tpu.train.pretrained import (adopt_pretrained_task1,
                                      convert_torch_resnet50)
from cpg_tpu.train.sequence import init_state, start_task

from .helpers import synthetic_task, tiny_cnn  # noqa: F401


def test_check_state_clean_and_violations():
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    assert check_state(state) == []

    # corrupt: free weight nonzero
    k = "features/conv0/kernel"
    state.ownership[k] = state.ownership[k].at[0, 0, 0, 0].set(0)
    with pytest.raises(InvariantViolation, match="I2"):
        check_state(state)
    vs = check_state(state, strict=False)
    assert any("I2" in s for s in vs)

    # corrupt: ownership beyond task count
    state.shared[k] = state.shared[k].at[0, 0, 0, 0].set(0.0)
    state.ownership[k] = state.ownership[k].at[0, 0, 0, 1].set(9)
    assert any("I1" in s for s in check_state(state, strict=False))

    # corrupt: piggymask shape mismatch
    state2 = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state2, "a", 4, jax.random.PRNGKey(1))
    start_task(state2, "b", 3, jax.random.PRNGKey(2))
    state2.tasks[2].piggymask[k] = jnp.zeros((1, 1))
    assert any("I4" in s for s in check_state(state2, strict=False))


def _fake_torch_resnet50_state_dict(state):
    """Build a torchvision-shaped random state_dict consistent with our
    resnet50 shapes (inverse of the converter's transposes)."""
    rng = np.random.RandomState(0)
    sd = {}
    for k, w in state.shared.items():
        # cpg name -> torch name
        if k == "conv1/kernel":
            tk = "conv1.weight"
        else:
            seg = k.split("/")  # layerX/blockY/convZ|downsample
            blk = seg[1].replace("block", "")
            if seg[2] == "downsample":
                tk = f"{seg[0]}.{blk}.downsample.0.weight"
            else:
                tk = f"{seg[0]}.{blk}.{seg[2]}.weight"
        sd[tk] = np.transpose(rng.randn(*w.shape).astype(np.float32),
                              (3, 2, 0, 1))  # HWIO -> OIHW
    sd["fc.weight"] = rng.randn(1000, 2048).astype(np.float32)
    sd["fc.bias"] = np.zeros(1000, np.float32)
    sd["bn1.weight"] = np.ones(64, np.float32)
    sd["bn1.bias"] = np.zeros(64, np.float32)
    sd["bn1.running_mean"] = np.zeros(64, np.float32)
    sd["bn1.running_var"] = np.ones(64, np.float32)
    sd["bn1.num_batches_tracked"] = np.array(0)
    return sd


def test_convert_and_adopt_pretrained_resnet50():
    state = init_state("resnet50", jax.random.PRNGKey(0))
    sd = _fake_torch_resnet50_state_dict(state)
    shared, private, bn = convert_torch_resnet50(sd)
    # every sharable conv kernel converted with the right shape
    assert set(shared) == set(state.shared)
    for k in shared:
        assert shared[k].shape == state.shared[k].shape, k
    # head dropped into private naming (1000-way ImageNet head)
    assert private["classifier/kernel"].shape == (2048, 1000)

    tid = adopt_pretrained_task1(state, "imagenet", 1000, shared,
                                 private=None, bn_state=bn)
    assert tid == 1
    # all weights owned by task 1 (ref --use_imagenet_pretrained semantics)
    for own in jax.tree.leaves(state.ownership):
        assert int((own == 1).sum()) == own.size
    # adopted values actually installed
    np.testing.assert_allclose(
        np.array(state.shared["conv1/kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), rtol=1e-6)
    assert check_state(state) == []


def test_adopt_requires_fresh_state():
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    with pytest.raises(ValueError):
        adopt_pretrained_task1(state, "x", 10, {})
