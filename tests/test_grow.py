"""Growth: widening must preserve every existing task bit-exactly
(ref: width_multiplier growth embeds old weights in the enlarged tensors)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core.grow import _embed_flatten_dense, grow_private
from cpg_tpu.core.ownership import free_ratio
from cpg_tpu.inference import predict
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import grow_state, init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def test_grow_preserves_old_task_bit_exact():
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    mgr = Manager(
        state, tiny_cnn, 1, data, TrainConfig(lr=0.05, compute_dtype=jnp.float32),
        batch_size=32, lr_schedule="constant", augment_fn=norm_augment,
        preprocess_fn=normalize01,
    )
    mgr.train(epochs=4)
    mgr.train(epochs=3, prune_to=0.4, prune_freq=5, base_lr=0.01)

    x = normalize01(jnp.asarray(data["test_x"][:8]))
    before = predict(state, 1, x)

    grow_state(state, 1.5, jax.random.PRNGKey(9))
    # shapes actually grew
    assert state.shared["features/conv1/kernel"].shape[-1] == 24  # 16 * 1.5
    after = predict(state, 1, x)
    np.testing.assert_array_equal(np.array(before), np.array(after))
    # grown entries are free capacity
    assert float(free_ratio(state.ownership)) > 0.4


def test_grown_capacity_trains_new_task_without_forgetting():
    data1 = synthetic_task(0)
    data2 = synthetic_task(5, num_classes=6, n_train=512)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)
    mgr = Manager(state, tiny_cnn, 1, data1, cfg, batch_size=32,
                  lr_schedule="constant", augment_fn=norm_augment,
                  preprocess_fn=normalize01)
    mgr.train(epochs=6)
    mgr.train(epochs=3, prune_to=0.3, prune_freq=5, base_lr=0.01)
    x = normalize01(jnp.asarray(data1["test_x"][:8]))
    before = predict(state, 1, x)

    grow_state(state, 2.0, jax.random.PRNGKey(9))
    start_task(state, "b", 6, jax.random.PRNGKey(2))
    mgr2 = Manager(state, tiny_cnn, 2, data2, cfg, batch_size=32,
                   lr_schedule="constant", augment_fn=norm_augment,
                   preprocess_fn=normalize01)
    res = mgr2.train(epochs=8)
    assert res.acc > 0.6, f"grown task-2 failed to learn: {res.acc}"
    np.testing.assert_array_equal(np.array(before), np.array(predict(state, 1, x)))


def test_grow_spherenet20_flatten_auto_bit_exact():
    """SphereNet fc5 is fed by a (7,6,C) spatial flatten: growth must use the
    registered flatten-permutation embedding (models.FLATTEN_DIMS resolved by
    grow_state's default flatten_dims='auto'), or channel interleaving shifts
    old rows and silently changes old-task outputs."""
    from cpg_tpu.core.pruner import one_shot_prune

    state = init_state("spherenet20", jax.random.PRNGKey(0))
    start_task(state, "face", 8, jax.random.PRNGKey(1),
               model_kwargs={"head_type": "none"})
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 112, 96, 3).astype(np.float32))
    before = predict(state, 1, x)

    grow_state(state, 1.5, jax.random.PRNGKey(9))  # flatten_dims auto-resolved
    assert state.shared["fc5/kernel"].shape == (7 * 6 * 768, 768)
    # The embedding gains channels on growth: old dims must carry the same
    # math (tight allclose — XLA reduction order changes with the larger conv
    # shapes, exactly as cuDNN's would for the reference) and the new ones
    # must be EXACTLY zero for task 1's view. A wrong (block, non-flatten)
    # embedding scrambles fc5 rows and fails both by orders of magnitude.
    after = np.array(predict(state, 1, x))
    np.testing.assert_allclose(np.array(before), after[:, :512],
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_array_equal(after[:, 512:], 0.0)
    # a new task claiming the grown capacity must not disturb task 1 either
    start_task(state, "expr", 7, jax.random.PRNGKey(2),
               model_kwargs={"head_type": "linear"})
    np.testing.assert_array_equal(after, np.array(predict(state, 1, x)))


def test_flatten_dense_embedding_permutation():
    # dense fed by a (H,W,C) flatten: old rows interleave, not a block
    h, w, c_old, c_new, out_old, out_new = 2, 3, 4, 6, 5, 8
    rng = np.random.RandomState(0)
    old = jnp.asarray(rng.randn(h * w * c_old, out_old).astype(np.float32))
    fresh = jnp.zeros((h * w * c_new, out_new), jnp.float32)
    grown = _embed_flatten_dense(old, fresh, (h, w), c_old, c_new)
    # spot-check: feature x at spatial (i,j), channel c maps to the same weight
    x_old = rng.randn(h, w, c_old).astype(np.float32)
    x_new = np.zeros((h, w, c_new), np.float32)
    x_new[:, :, :c_old] = x_old
    y_old = x_old.reshape(-1) @ np.array(old)
    y_new = x_new.reshape(-1) @ np.array(grown)
    np.testing.assert_allclose(y_new[:out_old], y_old, rtol=1e-5)
    np.testing.assert_allclose(y_new[out_old:], 0.0, atol=1e-7)


def test_grow_private_fill_values():
    old = {"bn0/scale": jnp.full((4,), 2.0), "bn0/bias": jnp.full((4,), 3.0),
           "head/kernel": jnp.ones((4, 3)), "bn0/mean": jnp.full((4,), 5.0),
           "bn0/var": jnp.full((4,), 7.0)}
    fresh = {"bn0/scale": jnp.zeros((6,)), "bn0/bias": jnp.zeros((6,)),
             "head/kernel": jnp.zeros((6, 3)), "bn0/mean": jnp.zeros((6,)),
             "bn0/var": jnp.zeros((6,))}
    g = grow_private(old, fresh)
    np.testing.assert_array_equal(g["bn0/scale"], [2, 2, 2, 2, 1, 1])
    np.testing.assert_array_equal(g["bn0/bias"], [3, 3, 3, 3, 0, 0])
    np.testing.assert_array_equal(g["bn0/mean"], [5, 5, 5, 5, 0, 0])
    np.testing.assert_array_equal(g["bn0/var"], [7, 7, 7, 7, 1, 1])
    np.testing.assert_array_equal(g["head/kernel"][4:], 0.0)
