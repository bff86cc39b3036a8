"""TP-flavored channel sharding: kernels (+ownership+piggymask) sharded along
output channels on the model axis must reproduce single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.core.pruner import one_shot_prune
from cpg_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                   shared_shardings)
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step

from .helpers import norm_augment, normalize01, synthetic_task, tiny_cnn


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 fake devices")
def test_model_sharded_step_matches_replicated():
    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)

    def build():
        state = init_state("tiny_cnn", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        state.shared, state.ownership = one_shot_prune(
            state.shared, state.ownership, 1, jnp.float32(0.5))
        start_task(state, "b", 3, jax.random.PRNGKey(2))
        step, (opt_w, opt_pm) = build_train_step(
            tiny_cnn, num_classes=3, mult=1.0, has_piggymask=True, cfg=cfg,
            augment_fn=lambda x, r: normalize01(x))
        t = state.tasks[2]
        ows = opt_w.init({"shared": state.shared, "private": t.private})
        opms = opt_pm.init(t.piggymask)
        return state, t, step, ows, opms

    x = jnp.asarray(data["train_x"][:32])
    y = jnp.asarray(data["train_y"][:32] % 3)
    rng = jax.random.PRNGKey(3)

    state, t, step, ows, opms = build()
    ref = jax.jit(step)(state.shared, t.piggymask, t.private, t.bn_state,
                        ows, opms, state.ownership, 2, x, y, rng, 0)

    state2, t2, step2, ows2, opms2 = build()
    mesh = make_mesh(n_model=2, devices=jax.devices()[:4])  # data=2, model=2
    ksh = shared_shardings(mesh, state2.shared, model_sharded=True)
    rep = replicated(mesh)
    shared = jax.device_put(state2.shared, ksh)
    own = jax.device_put(state2.ownership, ksh)
    pm = jax.device_put(t2.piggymask, ksh)
    priv = jax.tree.map(lambda a: jax.device_put(a, rep), t2.private)
    bn = jax.tree.map(lambda a: jax.device_put(a, rep), t2.bn_state)
    ows2 = jax.tree.map(lambda a: jax.device_put(a, rep), ows2)
    opms2 = jax.tree.map(lambda a: jax.device_put(a, rep), opms2)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    got = jax.jit(step2)(shared, pm, priv, bn, ows2, opms2, own, 2, xs, ys,
                         rng, 0)

    np.testing.assert_allclose(float(ref[-1]["loss"]), float(got[-1]["loss"]),
                               rtol=1e-5)
    for k in ref[0]:
        np.testing.assert_allclose(np.array(ref[0][k]), np.array(got[0][k]),
                                   rtol=3e-4, atol=3e-6)
    for k in ref[1]:  # piggymask updates too
        np.testing.assert_allclose(np.array(ref[1][k]), np.array(got[1][k]),
                                   rtol=3e-4, atol=3e-6)


def _tp_state():
    state = init_state("tiny_cnn", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "b", 3, jax.random.PRNGKey(2))
    return state


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 fake devices")
def test_manager_tp_matches_single_device():
    """The PRODUCTION path (Manager with a model-axis mesh) must actually
    shard kernels on the model axis AND reproduce single-device numerics —
    VERDICT r2 #1: `--parallel 2 --parallel-model 2` previously replicated
    state and silently duplicated compute across the model axis."""
    data = synthetic_task(0)
    data = dict(data, train_y=(data["train_y"] % 3),
                test_y=(data["test_y"] % 3), num_classes=3)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)

    st1 = _tp_state()
    m1 = Manager(st1, tiny_cnn, 2, data, cfg, batch_size=32,
                 augment_fn=norm_augment, seed=5, lr_schedule="constant")
    r1 = m1.train(1)

    st2 = _tp_state()
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    m2 = Manager(st2, tiny_cnn, 2, data, cfg, batch_size=32,
                 augment_fn=norm_augment, seed=5, lr_schedule="constant",
                 mesh=mesh)
    # the live state is REALLY model-sharded: every divisible sharable kernel
    # (and its ownership/piggymask twins) carries 'model' in its spec
    t2 = st2.tasks[2]
    for tree in (st2.shared, st2.ownership, t2.piggymask):
        specs = {k: v.sharding.spec for k, v in tree.items()}
        sharded = [k for k, s in specs.items() if len(s) and s[-1] == "model"]
        assert sharded, f"no model-sharded leaves in {list(specs)}"
    # Adam/momentum states inherited the kernel shardings via zeros_like
    mom = m2.opt_w_state.inner_state[0].trace["shared"]
    assert any(len(v.sharding.spec) and v.sharding.spec[-1] == "model"
               for v in jax.tree.leaves(mom))
    r2 = m2.train(1)

    np.testing.assert_allclose(r1.acc, r2.acc, atol=1e-6)
    np.testing.assert_allclose(r1.loss, r2.loss, rtol=1e-4, atol=1e-6)
    for k in st1.shared:
        np.testing.assert_allclose(np.asarray(st1.shared[k]),
                                   np.asarray(st2.shared[k]),
                                   rtol=3e-4, atol=3e-6)
    for k in st1.tasks[2].piggymask:
        np.testing.assert_allclose(np.asarray(st1.tasks[2].piggymask[k]),
                                   np.asarray(st2.tasks[2].piggymask[k]),
                                   rtol=3e-4, atol=3e-6)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 fake devices")
def test_run_sequence_tp_full_cycle():
    """The WHOLE sequence driver (pick -> compact walk -> snapshots ->
    checkpointed growth machinery) over a (data=2, model=2) mesh: host
    snapshots of sharded trees, gradual prune on sharded ownership, and the
    per-phase Manager re-placement must all compose; accuracies match the
    single-device run."""
    from cpg_tpu.train.sequence import SequenceConfig, run_sequence

    tasks = {"t1": synthetic_task(0), "t2": synthetic_task(5, num_classes=3)}
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    seq = SequenceConfig(finetune_epochs=4, prune_epochs=1, retrain_epochs=1,
                         prune_ratios=(0.3,), batch_size=32, lr=0.05,
                         prune_freq=5, seed=0, lr_schedule="constant")
    s1, r1 = run_sequence("tiny_cnn", tasks, cfg, seq,
                          augment_fn=norm_augment, preprocess_fn=normalize01)
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    s2, r2 = run_sequence("tiny_cnn", tasks, cfg, seq,
                          augment_fn=norm_augment, preprocess_fn=normalize01,
                          mesh=mesh)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a.pick_acc, b.pick_acc, atol=1e-6)
        np.testing.assert_allclose(a.final_acc, b.final_acc, atol=1e-6)
        assert a.chosen_ratio == b.chosen_ratio
    # weights: reduction reassociation drifts compound over the multi-phase
    # cycle (single-step parity is rtol 3e-4; ~100 steps over two tasks
    # accumulate to ~2e-3 on a few % of entries) — same-class bound as the
    # growth audits use
    for k in s1.shared:
        np.testing.assert_allclose(np.asarray(s1.shared[k]),
                                   np.asarray(s2.shared[k]),
                                   rtol=5e-3, atol=1e-4)
    # ownership: the selection RULE is sharding-independent, but drifted
    # weight values can flip entries exactly at the k-th-magnitude cutoff —
    # demand near-total agreement, not bit equality
    total = same = 0
    for k in s1.ownership:
        a, b = np.asarray(s1.ownership[k]), np.asarray(s2.ownership[k])
        total += a.size
        same += int((a == b).sum())
    assert same / total > 0.995, f"ownership agreement {same / total:.4f}"


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 fake devices")
def test_manager_tp_vit_matches_single_device():
    """Same production TP guarantee for the transformer family: a Manager on
    a (data=2, model=2) mesh shards the ViT's q/k/v/proj/mlp kernels on the
    model axis (head-parallel attention) and reproduces single-device
    numerics."""
    from .helpers import tiny_vit

    def vit_state():
        state = init_state("tiny_vit", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        state.shared, state.ownership = one_shot_prune(
            state.shared, state.ownership, 1, jnp.float32(0.5))
        start_task(state, "b", 3, jax.random.PRNGKey(2))
        return state

    data = synthetic_task(0)
    data = dict(data, train_y=(data["train_y"] % 3),
                test_y=(data["test_y"] % 3), num_classes=3)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)

    st1 = vit_state()
    r1 = Manager(st1, tiny_vit, 2, data, cfg, batch_size=32,
                 augment_fn=norm_augment, seed=5,
                 lr_schedule="constant").train(1)

    st2 = vit_state()
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    m2 = Manager(st2, tiny_vit, 2, data, cfg, batch_size=32,
                 augment_fn=norm_augment, seed=5, lr_schedule="constant",
                 mesh=mesh)
    specs = {k: v.sharding.spec for k, v in st2.shared.items()}
    sharded = [k for k, s in specs.items() if len(s) and s[-1] == "model"]
    assert any("attn" in k for k in sharded), sharded
    r2 = m2.train(1)

    np.testing.assert_allclose(r1.acc, r2.acc, atol=1e-6)
    np.testing.assert_allclose(r1.loss, r2.loss, rtol=1e-4, atol=1e-6)
    for k in st1.shared:
        np.testing.assert_allclose(np.asarray(st1.shared[k]),
                                   np.asarray(st2.shared[k]),
                                   rtol=3e-4, atol=3e-6)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 fake devices")
def test_text_embed_gather_model_sharded():
    """The text family's one new sharded op: a (vocab, D) embedding table
    model-sharded on D, gathered by token rows inside the masked step —
    numerics must match the replicated run."""
    import numpy as np

    from cpg_tpu.data.text import synthetic_text_task
    from .helpers import ident_augment, tiny_textcls

    d = synthetic_text_task(0, num_classes=4, vocab=64, seq_len=16,
                            n_train=128, n_test=32)
    cfg = TrainConfig(lr=3e-3, compute_dtype=jnp.float32, optimizer="adam")

    def build():
        state = init_state("tiny_textcls", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        state.shared, state.ownership = one_shot_prune(
            state.shared, state.ownership, 1, jnp.float32(0.5))
        start_task(state, "b", 4, jax.random.PRNGKey(2))
        return state

    st1 = build()
    r1 = Manager(st1, tiny_textcls, 2, d, cfg, batch_size=32,
                 augment_fn=ident_augment, seed=3,
                 lr_schedule="constant").train(1)

    st2 = build()
    mesh = make_mesh(n_data=2, n_model=2, devices=jax.devices()[:4])
    m2 = Manager(st2, tiny_textcls, 2, d, cfg, batch_size=32,
                 augment_fn=ident_augment, seed=3, lr_schedule="constant",
                 mesh=mesh)
    spec = st2.shared["embed/kernel"].sharding.spec
    assert len(spec) and spec[-1] == "model", spec
    r2 = m2.train(1)
    np.testing.assert_allclose(r1.loss, r2.loss, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st1.shared["embed/kernel"]),
        np.asarray(st2.shared["embed/kernel"]), rtol=3e-4, atol=3e-6)
