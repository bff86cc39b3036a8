"""Serving closure + checkpointing a GROWN multi-width state."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.inference import make_predict_fn, predict
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import grow_state, init_state, start_task
from cpg_tpu.train.step import TrainConfig
from cpg_tpu.utils.checkpoint import load_state, save_state

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def _built_state():
    data = synthetic_task(0)
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    mgr = Manager(state, tiny_cnn, 1, data, cfg, batch_size=32,
                  lr_schedule="constant", augment_fn=norm_augment,
                  preprocess_fn=normalize01)
    mgr.train(epochs=4)
    mgr.train(epochs=2, prune_to=0.4, prune_freq=5, base_lr=0.01)
    return state, data


def test_make_predict_fn_matches_predict():
    state, data = _built_state()
    x = normalize01(jnp.asarray(data["test_x"][:16]))
    serve = make_predict_fn(state, 1, preprocess_fn=None)
    # jit fuses differently than eager -> float-noise tolerance (bit-exact
    # guarantees apply within one compiled path, pinned by other tests)
    np.testing.assert_allclose(np.array(serve(x)),
                               np.array(predict(state, 1, x)),
                               rtol=1e-5, atol=1e-6)
    # jitted closure is reusable across batches
    x2 = normalize01(jnp.asarray(data["test_x"][16:32]))
    np.testing.assert_allclose(np.array(serve(x2)),
                               np.array(predict(state, 1, x2)),
                               rtol=1e-5, atol=1e-6)


def test_grown_state_checkpoint_roundtrip(tmp_path):
    state, data = _built_state()
    grow_state(state, 1.5, jax.random.PRNGKey(9))
    start_task(state, "b", 3, jax.random.PRNGKey(2))
    data2 = synthetic_task(5, num_classes=3)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    mgr2 = Manager(state, tiny_cnn, 2, data2, cfg, batch_size=32,
                   lr_schedule="constant", augment_fn=norm_augment,
                   preprocess_fn=normalize01)
    mgr2.train(epochs=2)

    p = save_state(state, str(tmp_path / "grown"))
    restored = load_state(p)
    assert restored.width_mult == 1.5
    assert restored.shared["features/conv1/kernel"].shape[-1] == 24
    for tid, d in [(1, data), (2, data2)]:
        x = normalize01(jnp.asarray(d["test_x"][:8]))
        np.testing.assert_array_equal(
            np.array(predict(state, tid, x)),
            np.array(predict(restored, tid, x)))
