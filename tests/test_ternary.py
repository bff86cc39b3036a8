"""Ternary mask mode (ref Ternarizer): prior weights picked with sign."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core.ownership import OWN_DTYPE
from cpg_tpu.inference import predict
from cpg_tpu.ops.masked import effective_kernel
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def test_ternary_effective_kernel():
    w = jnp.array([1.0, 2.0, 3.0, 4.0])
    own = jnp.array([1, 1, 1, 2], OWN_DTYPE)
    pm = jnp.array([-0.5, 0.001, 0.9, 0.0])
    eff = effective_kernel(w, own, pm, 2, mask_mode="ternary")
    # -1 * w, 0 * w, +1 * w on prior entries; owned passes
    np.testing.assert_allclose(np.array(eff), [-1.0, 0.0, 3.0, 4.0])


def test_ternary_mode_trains_and_round_trips(tmp_path):
    data1 = synthetic_task(0)
    data2 = synthetic_task(5, num_classes=3)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    state.mask_mode = "ternary"
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)
    m1 = Manager(state, tiny_cnn, 1, data1, cfg, batch_size=32,
                 lr_schedule="constant", augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    m1.train(epochs=6)
    m1.train(epochs=3, prune_to=0.5, prune_freq=5, base_lr=0.01)
    start_task(state, "b", 3, jax.random.PRNGKey(2))
    m2 = Manager(state, tiny_cnn, 2, data2, cfg, batch_size=32,
                 lr_schedule="constant", augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    res = m2.train(epochs=8)
    assert res.acc > 0.6, f"ternary task-2 failed: {res.acc}"

    from cpg_tpu.utils.checkpoint import load_state, save_state

    p = save_state(state, str(tmp_path / "tern"))
    restored = load_state(p)
    assert restored.mask_mode == "ternary"
    x = normalize01(jnp.asarray(data2["test_x"][:8]))
    np.testing.assert_array_equal(np.array(predict(state, 2, x)),
                                  np.array(predict(restored, 2, x)))
