"""End-to-end: task-1 masked train + gradual prune + retrain (BASELINE config 1
shape, CPU-runnable), then add-task pick and exact no-forgetting."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core.ownership import free_ratio, task_ratio
from cpg_tpu.inference import predict
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def _cfg():
    # f32 on CPU tests: bf16 CPU emulation is slow and noisy
    return TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)


def _manager(state, task_id, data, seed=0):
    return Manager(
        state, tiny_cnn, task_id, data, _cfg(), batch_size=32, seed=seed,
        lr_schedule="constant", augment_fn=norm_augment,
        preprocess_fn=normalize01,
    )


def test_task1_train_prune_retrain_cycle():
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    tid = start_task(state, "task_a", data["num_classes"], jax.random.PRNGKey(1))
    assert tid == 1
    mgr = _manager(state, 1, data)

    res = mgr.train(epochs=8)
    assert res.acc > 0.8, f"task-1 training failed to learn: acc={res.acc}"

    # gradual prune to 50% + retrain inside the same phase
    res2 = mgr.train(epochs=6, prune_to=0.5, prune_freq=5, base_lr=0.01)
    freed = float(free_ratio(state.ownership))
    assert abs(freed - 0.5) < 0.02, f"free ratio {freed} != 0.5"
    assert res2.acc > 0.7, f"post-prune acc collapsed: {res2.acc}"
    # released weights are zero
    for w, m in zip(jax.tree.leaves(state.shared), jax.tree.leaves(state.ownership)):
        assert float(jnp.abs(jnp.where(m == 0, w, 0)).max()) == 0.0


def test_add_task_pick_and_never_forget():
    data1 = synthetic_task(0)
    data2 = synthetic_task(7, num_classes=3)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data1["num_classes"], jax.random.PRNGKey(1))
    mgr1 = _manager(state, 1, data1)
    mgr1.train(epochs=8)
    mgr1.train(epochs=6, prune_to=0.5, prune_freq=5, base_lr=0.01)
    acc1 = mgr1.eval()

    x_probe = normalize01(jnp.asarray(data1["test_x"][:16]))
    logits_before = predict(state, 1, x_probe)

    # task 2 picks from task-1 weights and trains the released capacity
    tid2 = start_task(state, "b", data2["num_classes"], jax.random.PRNGKey(2))
    assert tid2 == 2 and state.tasks[2].piggymask is not None
    mgr2 = _manager(state, 2, data2)
    res = mgr2.train(epochs=8)
    assert res.acc > 0.7, f"task-2 failed to learn: acc={res.acc}"

    # piggymask actually moved (picking happened)
    pm_leaves = jax.tree.leaves(state.tasks[2].piggymask)
    assert any(float(jnp.abs(p - 1e-2).max()) > 1e-6 for p in pm_leaves)

    # task-1 weights bit-frozen; logits and accuracy bit-exact
    logits_after = predict(state, 1, x_probe)
    np.testing.assert_array_equal(np.array(logits_before), np.array(logits_after))
    mgr1b = _manager(state, 1, data1)
    assert mgr1b.eval() == acc1

    # ownership sane: task2 owns exactly the previously-free entries
    assert float(free_ratio(state.ownership)) == 0.0
    assert 0.4 < float(task_ratio(state.ownership, 2)) < 0.6
