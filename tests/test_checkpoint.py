"""Checkpoint round-trip: mask selection and every task's view bit-exact."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.inference import predict
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig
from cpg_tpu.utils.checkpoint import latest_checkpoint, load_state, save_state

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    data1 = synthetic_task(0)
    data2 = synthetic_task(7, num_classes=3)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    m1 = Manager(state, tiny_cnn, 1, data1, cfg, batch_size=32,
                 lr_schedule="constant", augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    m1.train(epochs=3)
    m1.train(epochs=2, prune_to=0.4, prune_freq=5, base_lr=0.01)
    start_task(state, "b", 3, jax.random.PRNGKey(2))
    m2 = Manager(state, tiny_cnn, 2, data2, cfg, batch_size=32,
                 lr_schedule="constant", augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    m2.train(epochs=3)

    p = save_state(state, str(tmp_path / "ckpt" / "task2_post"))
    state2 = load_state(p)

    assert state2.arch == "tiny_cnn" and state2.num_tasks == 2
    assert state2.tasks[2].piggymask is not None
    # ownership masks bit-exact (int8)
    for k in state.ownership:
        np.testing.assert_array_equal(np.array(state.ownership[k]),
                                      np.array(state2.ownership[k]))
        assert state2.ownership[k].dtype == np.int8
    # every task's logits bit-exact through the restored state
    for tid, data in [(1, data1), (2, data2)]:
        x = normalize01(jnp.asarray(data["test_x"][:8]))
        np.testing.assert_array_equal(
            np.array(predict(state, tid, x)), np.array(predict(state2, tid, x)))

    assert latest_checkpoint(str(tmp_path / "ckpt")) == p


def test_restored_state_continues_training(tmp_path):
    """Resume semantics: a restored state trains a new task normally."""
    data1 = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    m1 = Manager(state, tiny_cnn, 1, data1, cfg, batch_size=32,
                 lr_schedule="constant", augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    m1.train(epochs=4)
    m1.train(epochs=2, prune_to=0.5, prune_freq=5, base_lr=0.01)
    save_state(state, str(tmp_path / "c1"))

    restored = load_state(str(tmp_path / "c1"))
    data2 = synthetic_task(3, num_classes=3)
    start_task(restored, "b", 3, jax.random.PRNGKey(5))
    m2 = Manager(restored, tiny_cnn, 2, data2, cfg, batch_size=32,
                 lr_schedule="constant", augment_fn=norm_augment,
                 preprocess_fn=normalize01)
    res = m2.train(epochs=6)
    assert res.acc > 0.6, f"restored state failed to train task 2: {res.acc}"


def test_async_save_survives_donation(tmp_path):
    """save_state(block=False) must snapshot device->host BEFORE returning:
    the live arrays are donated into the very next jitted step in
    run_sequence, so a lazy reference would read deleted buffers. The loaded
    checkpoint must equal the state AT SAVE TIME, not after training moved on."""
    from cpg_tpu.utils.checkpoint import wait_for_saves

    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    mgr = Manager(state, tiny_cnn, 1, data, cfg, batch_size=32,
                  lr_schedule="constant", augment_fn=norm_augment,
                  preprocess_fn=normalize01)
    mgr.train(epochs=2)
    snap = {k: np.array(v) for k, v in state.shared.items()}

    p = save_state(state, str(tmp_path / "async_ckpt"), block=False)
    # immediately donate/overwrite the live buffers by training more
    mgr.train(epochs=2)
    wait_for_saves()

    restored = load_state(p)
    for k, v in snap.items():
        np.testing.assert_array_equal(np.array(restored.shared[k]), v)
        # and training really did move the live state on
    moved = any(not np.array_equal(np.array(state.shared[k]), snap[k])
                for k in snap)
    assert moved, "post-save training changed nothing; test is vacuous"
