"""run_sequence over an existing state (pretrained task 1 / face chain)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.train.pretrained import adopt_pretrained_task1
from cpg_tpu.train.sequence import (SequenceConfig, init_state, run_sequence,
                                    snapshot)
from cpg_tpu.train.step import TrainConfig
from cpg_tpu.inference import predict

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


def test_sequence_continues_from_adopted_state():
    # "pretrained" = random weights adopted as task 1, all owned by task 1
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    shared = {k: rng.randn(*w.shape).astype(np.float32) * 0.1
              for k, w in state.shared.items()}
    adopt_pretrained_task1(state, "pretrained", 4, shared)
    assert state.num_tasks == 1

    x = normalize01(jnp.asarray(synthetic_task(0)["test_x"][:8]))
    logits_t1 = predict(state, 1, x)

    tasks = {"t2": synthetic_task(5, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=4, prune_epochs=1, retrain_epochs=1,
                         prune_ratios=(0.3,), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0)
    out_state, reports = run_sequence(
        "tiny_cnn", tasks, cfg, seq, augment_fn=norm_augment,
        preprocess_fn=normalize01, state=state)

    # task ids continue from the adopted task; no weights of task 1 touched
    assert reports[0].task_id == 2
    # task 1 had NO free capacity (all owned) -> task 2 trained piggymask-only
    assert out_state.tasks[2].piggymask is not None
    np.testing.assert_array_equal(np.array(logits_t1),
                                  np.array(predict(out_state, 1, x)))


def test_sequence_state_arch_mismatch():
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    import pytest

    with pytest.raises(ValueError):
        run_sequence("vgg16_bn_cifar", {}, state=state)
