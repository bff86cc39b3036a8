"""Face workload: A-Softmax training on SphereNet-20 (tiny), LFW protocol,
and the expression-task growth chain (BASELINE configs 4 and 5, miniature)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.data.face import (casia_task, eval_pairs, make_pairs,
                               synthetic_faces, verification_accuracy)
from cpg_tpu.inference import predict
from cpg_tpu.models.spherenet import spherenet20
from cpg_tpu.train.losses import make_angle_loss
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import synthetic_task  # noqa: F401


def test_verification_protocol_pure():
    # perfectly separable sims -> accuracy 1; random sims -> ~0.5
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 2, 200)
    sims = labels * 0.8 + 0.1 + rng.randn(200) * 0.01
    acc, std = verification_accuracy(sims, labels)
    assert acc > 0.99
    acc_r, _ = verification_accuracy(rng.randn(200), labels)
    assert 0.3 < acc_r < 0.7


def test_face_train_and_lfw_eval():
    data = casia_task(seed=0, num_ids=8, per_id=10)
    assert data["num_classes"] == 8
    state = init_state("spherenet20", jax.random.PRNGKey(0))
    start_task(state, "casia", data["num_classes"], jax.random.PRNGKey(1),
               model_kwargs={"head_type": "angle"})
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    mgr = Manager(
        state, spherenet20, 1, data, cfg, batch_size=16, seed=0,
        lr_schedule="constant", loss_fn=make_angle_loss(),
        augment_fn=lambda x, r: (x.astype(jnp.float32) - 127.5) / 128.0,
        preprocess_fn=lambda x: (x.astype(jnp.float32) - 127.5) / 128.0,
    )
    res = mgr.train(epochs=2)
    assert np.isfinite(res.loss)

    # LFW protocol over task-conditioned embeddings (head_type='none')
    x, y = synthetic_faces(num_ids=6, per_id=6, seed=3)
    i1, i2, same = make_pairs(x, y, n_pairs=60, seed=1)

    def embed(b):
        return predict(state, 1, (b.astype(jnp.float32) - 127.5) / 128.0,
                       model_kwargs={"head_type": "none"})

    acc, std = eval_pairs(embed, x, i1, i2, same, batch_size=18)
    assert 0.0 <= acc <= 1.0 and std >= 0.0


def test_expression_task_grown_on_face_model():
    """Config 5: a linear-head task added on the compacted face trunk."""
    data1 = casia_task(seed=0, num_ids=6, per_id=8)
    state = init_state("spherenet20", jax.random.PRNGKey(0))
    start_task(state, "casia", data1["num_classes"], jax.random.PRNGKey(1),
               model_kwargs={"head_type": "angle"})
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    norm = lambda x: (x.astype(jnp.float32) - 127.5) / 128.0
    mgr = Manager(state, spherenet20, 1, data1, cfg, batch_size=16,
                  lr_schedule="constant", loss_fn=make_angle_loss(),
                  augment_fn=lambda x, r: norm(x), preprocess_fn=norm)
    mgr.train(epochs=1)
    mgr.train(epochs=1, prune_to=0.3, prune_freq=3, base_lr=0.01)

    probe = norm(jnp.asarray(data1["test_x"][:4]))
    emb_before = predict(state, 1, probe, model_kwargs={"head_type": "none"})

    # expression task: 7 classes, plain linear head on the shared trunk
    ex, ey = synthetic_faces(num_ids=7, per_id=8, seed=9)
    data2 = {"train_x": ex[:48], "train_y": ey[:48] % 7,
             "test_x": ex[48:], "test_y": ey[48:] % 7, "num_classes": 7}
    start_task(state, "expression", 7, jax.random.PRNGKey(2),
               model_kwargs={"head_type": "linear"})
    mgr2 = Manager(state, spherenet20, 2, data2, cfg, batch_size=8,
                   lr_schedule="constant",
                   augment_fn=lambda x, r: norm(x), preprocess_fn=norm)
    res = mgr2.train(epochs=2)
    assert np.isfinite(res.loss)

    # face embeddings bit-exact after the expression task trained
    emb_after = predict(state, 1, probe, model_kwargs={"head_type": "none"})
    np.testing.assert_array_equal(np.array(emb_before), np.array(emb_after))
