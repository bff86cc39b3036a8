"""Transformer family (models/vit.py): the CPG engine is architecture-generic.

No reference counterpart exists (the ref zoo is all-CNN); these tests hold the
ViT to the SAME invariants as the CNNs — masked training learns, add-task is
bit-exact zero-forgetting, and growth follows the transformer exact-
preservation law (fixed embed dim; new heads + MLP hidden units inert for old
tasks)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core.ownership import free_ratio
from cpg_tpu.inference import predict
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import grow_state, init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_vit


def _cfg():
    return TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)


def _manager(state, task_id, data, seed=0):
    return Manager(
        state, tiny_vit, task_id, data, _cfg(), batch_size=32, seed=seed,
        lr_schedule="constant", augment_fn=norm_augment,
        preprocess_fn=normalize01,
    )


def test_vit_shapes_and_param_split():
    from cpg_tpu.models import framework as fw

    x = jnp.zeros((2, 16, 16, 3))
    shared, private, bn = fw.init(jax.random.PRNGKey(0), tiny_vit, x,
                                  num_classes=4)
    # every shared entry is a maskable kernel; LN/pos/head/biases are private
    assert all(k.endswith("/kernel") for k in shared)
    assert shared["blocks/0/attn/q/kernel"].shape == (32, 32)
    assert shared["blocks/0/mlp/fc1/kernel"].shape == (32, 128)
    assert bn == {}  # transformers carry no running stats
    assert private["patch/pos_embed"].shape == (4, 32)
    assert "blocks/1/ln2/scale" in private
    y, _ = fw.apply(tiny_vit, shared, private, bn, x, train=True,
                    num_classes=4)
    assert y.shape == (2, 4)


def test_vit_train_prune_add_task_never_forget():
    data1 = synthetic_task(0)
    data2 = synthetic_task(7, num_classes=3)
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", data1["num_classes"], jax.random.PRNGKey(1))
    mgr1 = _manager(state, 1, data1)
    res = mgr1.train(epochs=10)
    assert res.acc > 0.7, f"vit task-1 failed to learn: acc={res.acc}"
    mgr1.train(epochs=6, prune_to=0.5, prune_freq=5, base_lr=0.005)
    freed = float(free_ratio(state.ownership))
    assert abs(freed - 0.5) < 0.02

    x_probe = normalize01(jnp.asarray(data1["test_x"][:16]))
    before = predict(state, 1, x_probe)

    start_task(state, "b", data2["num_classes"], jax.random.PRNGKey(2))
    mgr2 = _manager(state, 2, data2)
    res2 = mgr2.train(epochs=10)
    assert res2.acc > 0.6, f"vit task-2 failed to learn: acc={res2.acc}"
    # task-1 logits BIT-exact after task 2 trained over picked weights
    np.testing.assert_array_equal(np.array(before),
                                  np.array(predict(state, 1, x_probe)))


def test_vit_grow_preserves_old_task():
    """Growth law: embed dim fixed; q/k/v widen by whole heads, MLP hidden
    widens; old-task logits are preserved and grown capacity is free."""
    data = synthetic_task(0)
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    mgr = _manager(state, 1, data)
    mgr.train(epochs=6)
    mgr.train(epochs=4, prune_to=0.4, prune_freq=5, base_lr=0.005)

    x = normalize01(jnp.asarray(data["test_x"][:8]))
    before = predict(state, 1, x)

    grow_state(state, 1.5, jax.random.PRNGKey(9))
    # heads 2 -> 3 (head_dim 16 fixed): inner 32 -> 48; mlp 128 -> 192;
    # embed dim (kernel input axes fed by the residual stream) unchanged
    assert state.shared["blocks/0/attn/q/kernel"].shape == (32, 48)
    assert state.shared["blocks/0/attn/proj/kernel"].shape == (48, 32)
    assert state.shared["blocks/0/mlp/fc1/kernel"].shape == (32, 192)
    assert state.shared["blocks/0/mlp/fc2/kernel"].shape == (192, 32)
    assert state.shared["patch/proj/kernel"].shape == (8, 8, 3, 32)

    # across GROW the math is exact but the XLA program changes shape (wider
    # K dots may reassociate) — tight allclose per the repo convention
    # (CLAUDE.md invariants; same as the SphereNet/text growth tests)
    after = predict(state, 1, x)
    np.testing.assert_allclose(np.array(before), np.array(after),
                               rtol=2e-6, atol=2e-6)
    assert float(free_ratio(state.ownership)) > 0.3


def test_vit_adam_warmup_recipe_and_no_forgetting():
    """The transformer recipe (optimizer='adam' + warmup_cosine) trains the
    ViT, and Adam's stateful moments still respect gradient gating: task-1
    logits stay BIT-exact while task 2 trains with adam (stateful moments must respect gating)."""
    from cpg_tpu.train.manager import _lr_at

    # warmup_cosine shape: linear ramp then cosine to ~0
    assert _lr_at(1.0, 0, 20, "warmup_cosine") == 0.5  # warm=2: (0+1)/2
    assert _lr_at(1.0, 1, 20, "warmup_cosine") == 1.0
    assert _lr_at(1.0, 19, 20, "warmup_cosine") < 0.01

    data1 = synthetic_task(0)
    data2 = synthetic_task(7, num_classes=3)
    cfg = TrainConfig(lr=3e-3, lr_mask=1e-3, compute_dtype=jnp.float32,
                      optimizer="adam")
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", data1["num_classes"], jax.random.PRNGKey(1))
    mgr1 = Manager(state, tiny_vit, 1, data1, cfg, batch_size=32,
                   lr_schedule="warmup_cosine", augment_fn=norm_augment,
                   preprocess_fn=normalize01)
    res = mgr1.train(epochs=10)
    assert res.acc > 0.7, f"adam vit failed to learn: acc={res.acc}"
    mgr1.train(epochs=4, prune_to=0.5, prune_freq=5, base_lr=1e-3)
    x = normalize01(jnp.asarray(data1["test_x"][:8]))
    before = predict(state, 1, x)

    start_task(state, "b", data2["num_classes"], jax.random.PRNGKey(2))
    Manager(state, tiny_vit, 2, data2, cfg, batch_size=32,
            lr_schedule="warmup_cosine", augment_fn=norm_augment,
            preprocess_fn=normalize01).train(epochs=6)
    np.testing.assert_array_equal(np.array(before),
                                  np.array(predict(state, 1, x)))


def test_vit_run_sequence_with_forced_growth():
    """The WHOLE sequence driver on the transformer: compact walk, a forced
    growth-ladder event (goal 1.1 unreachable), in-process growth audit
    (verify_growth), and zero-forgetting reports across 3 tasks."""
    from cpg_tpu.train.sequence import SequenceConfig, run_sequence

    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(5, num_classes=3),
             "t3": synthetic_task(9, num_classes=4)}
    cfg = TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=4, prune_epochs=1, retrain_epochs=1,
                         prune_ratios=(0.3,), batch_size=32, lr=0.05,
                         prune_freq=5, lr_schedule="constant",
                         on_goal_miss="accept", verify_growth=True,
                         growth_step=0.5, max_width_mult=1.5)
    goals = {"t1": 0.0, "t2": 1.1, "t3": 0.0}  # t2 walks the ladder to 1.5
    state, reports = run_sequence(
        "tiny_vit", tasks, cfg, seq, goals=goals, augment_fn=norm_augment,
        preprocess_fn=normalize01)
    assert state.width_mult == 1.5
    assert reports[1].width_mult == 1.5  # t2 grew
    assert state.shared["blocks/0/attn/q/kernel"].shape == (32, 48)
    # t3 trained at the grown width and learned
    assert reports[2].final_acc > 0.5, reports[2]


def test_vit_serving_matches_predict():
    """TaskServer (bf16/int8 PTQ serving) is arch-generic: ViT logits through
    the server equal the reference-semantics predict() path."""
    from cpg_tpu.serve import TaskServer

    data = synthetic_task(0)
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    _manager(state, 1, data).train(epochs=2)
    x = data["test_x"][:5]
    srv = TaskServer(state, preprocess_fn=normalize01,
                     compute_dtype=jnp.float32, min_bucket=4)
    got = srv.predict(1, x)
    want = np.array(predict(state, 1, normalize01(jnp.asarray(x))))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    srv8 = TaskServer(state, preprocess_fn=normalize01, quantize="int8",
                      compute_dtype=jnp.float32, min_bucket=4)
    # int8 PTQ: top-1 agreement is the serving contract (not exact logits)
    assert (np.argmax(srv8.predict(1, x), -1) == np.argmax(want, -1)).all()


def test_vit_grown_capacity_trains_new_task_without_forgetting():
    data1 = synthetic_task(0)
    data2 = synthetic_task(5, num_classes=6, n_train=512)
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", data1["num_classes"], jax.random.PRNGKey(1))
    mgr = _manager(state, 1, data1)
    mgr.train(epochs=8)
    mgr.train(epochs=4, prune_to=0.3, prune_freq=5, base_lr=0.005)
    x = normalize01(jnp.asarray(data1["test_x"][:8]))
    before = predict(state, 1, x)

    grow_state(state, 2.0, jax.random.PRNGKey(9))
    # rebaseline at the grown program shape (allclose across the shape
    # change, BIT-equal within it — repo growth convention)
    after = np.array(predict(state, 1, x))
    np.testing.assert_allclose(np.array(before), after, rtol=2e-6, atol=2e-6)
    start_task(state, "b", data2["num_classes"], jax.random.PRNGKey(2))
    mgr2 = _manager(state, 2, data2, seed=1)
    res = mgr2.train(epochs=10)
    assert res.acc > 0.55, f"grown vit task-2 failed to learn: {res.acc}"
    np.testing.assert_array_equal(after, np.array(predict(state, 1, x)))
