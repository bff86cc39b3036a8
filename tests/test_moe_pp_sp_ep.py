"""MoE model family (models/moe.py) + the PP/SP/EP parallelism axes.

The reference has neither (its zoo is dense CNNs, its distributed story is
single-process DataParallel — SURVEY §2); these tests hold the new capacity
unit and the three new mesh axes to the SAME invariants the rest of the stack
obeys: bit-exact zero forgetting across add-task, exact-preservation growth
(here: whole experts), and sharded-equals-replicated numerics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.inference import predict
from cpg_tpu.models import framework as fw
from cpg_tpu.parallel.mesh import (act_sharder, batch_sharding, make_mesh,
                                   replicated, shared_shardings)
from cpg_tpu.parallel.pipeline import (_default_block_fn, make_pipeline_mesh,
                                       pipeline_blocks, stack_block_params)
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import grow_state, init_state, start_task
from cpg_tpu.train.step import TrainConfig

from .helpers import norm_augment, normalize01, synthetic_task, tiny_moe

MOE_KW = dict(depth=2, dim=32, heads=2, patch=8, n_experts=4)


def _cfg(**kw):
    return TrainConfig(lr=0.05, lr_mask=1e-3, compute_dtype=jnp.float32,
                       **kw)


def _manager(state, task_id, data, cfg=None):
    return Manager(state, tiny_moe, task_id, data, cfg or _cfg(),
                   batch_size=32, seed=0, lr_schedule="constant",
                   augment_fn=norm_augment, preprocess_fn=normalize01)


def test_moe_param_split_and_routing_shapes():
    from cpg_tpu.models.moe import vit_moe_cifar

    x = jnp.zeros((2, 32, 32, 3))
    shared, private, bn = fw.init(jax.random.PRNGKey(0), vit_moe_cifar, x,
                                  num_classes=4, **MOE_KW)
    # expert FFN kernels are shared (maskable, expert-stacked); the router
    # is task-private (per-task routing — old routers can't see new experts)
    assert shared["blocks/1/moe/experts/fc1/kernel"].shape == (4, 32, 128)
    assert shared["blocks/1/moe/experts/fc2/kernel"].shape == (4, 128, 32)
    assert private["blocks/1/moe/router/kernel"].shape == (32, 4)
    assert private["blocks/1/moe/router/gate_bias"].shape == (4,)
    assert all(k.endswith("/kernel") for k in shared)
    y, _ = fw.apply(vit_moe_cifar, shared, private, bn, x, train=False,
                    num_classes=4, **MOE_KW)
    assert y.shape == (2, 4)


def test_moe_learns_and_never_forgets():
    data1 = synthetic_task(0)
    data2 = synthetic_task(7, num_classes=3)
    state = init_state("tiny_moe", jax.random.PRNGKey(0))
    start_task(state, "a", data1["num_classes"], jax.random.PRNGKey(1))
    mgr1 = _manager(state, 1, data1)
    res = mgr1.train(epochs=10)
    assert res.acc > 0.7, f"moe task-1 failed to learn: acc={res.acc}"
    mgr1.train(epochs=6, prune_to=0.5, prune_freq=5, base_lr=0.005)

    x_probe = normalize01(jnp.asarray(data1["test_x"][:16]))
    before = predict(state, 1, x_probe)

    start_task(state, "b", data2["num_classes"], jax.random.PRNGKey(2))
    mgr2 = _manager(state, 2, data2)
    res2 = mgr2.train(epochs=10)
    assert res2.acc > 0.6, f"moe task-2 failed to learn: acc={res2.acc}"
    np.testing.assert_array_equal(np.array(before),
                                  np.array(predict(state, 1, x_probe)))


def test_moe_growth_adds_whole_experts_and_preserves():
    """Expert growth law: (E, D, F) -> (E', D, F) with old experts in the
    leading block; old-task ROUTING is bit-identical because grown router
    columns pad 0 / gate_bias pads -1e9 (core/grow._PRIVATE_FILL), making
    new experts unreachable with exactly-zero softmax mass."""
    data = synthetic_task(0)
    state = init_state("tiny_moe", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    mgr = _manager(state, 1, data)
    mgr.train(epochs=6)
    mgr.train(epochs=4, prune_to=0.4, prune_freq=5, base_lr=0.005)

    x = normalize01(jnp.asarray(data["test_x"][:8]))
    before = predict(state, 1, x)
    grow_state(state, 1.5, jax.random.PRNGKey(9))
    assert state.shared["blocks/1/moe/experts/fc1/kernel"].shape == (6, 32, 128)
    assert state.shared["blocks/1/moe/experts/fc2/kernel"].shape == (6, 128, 32)
    # grown router: old task's padded bias makes experts 4..5 unreachable
    t1 = state.tasks[1]
    assert t1.private["blocks/1/moe/router/kernel"].shape == (32, 6)
    assert float(t1.private["blocks/1/moe/router/gate_bias"][-1]) == -1e9
    after = predict(state, 1, x)
    np.testing.assert_allclose(np.array(before), np.array(after),
                               rtol=2e-5, atol=2e-5)


def test_moe_batching_invariance():
    """Routing/capacity are PER EXAMPLE: a sample's logits don't depend on
    what shares its batch (the serving invariance rule, serve.py)."""
    data = synthetic_task(0)
    state = init_state("tiny_moe", jax.random.PRNGKey(0))
    start_task(state, "a", data["num_classes"], jax.random.PRNGKey(1))
    x = normalize01(jnp.asarray(data["test_x"][:16]))
    # same batch SHAPE (one compiled program), different co-batched rows:
    # row 0's logits must be BIT-equal — no cross-example capacity contention
    a = predict(state, 1, x[:8])
    b = predict(state, 1, jnp.concatenate([x[:1], x[8:15]], axis=0))
    np.testing.assert_array_equal(np.array(a[:1]), np.array(b[:1]))


def test_ep_sp_sharded_matches_replicated():
    """EP + SP: expert kernels sharded on their EXPERT axis over `model`
    (shared_shardings' /experts/ rule), token + dispatch activations
    constrained at the models' labeled seams (mesh.act_sharder) — numerics
    match the unsharded forward."""
    from cpg_tpu.models.moe import vit_moe_cifar

    x = jnp.array(np.random.RandomState(0).rand(8, 32, 32, 3), jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), vit_moe_cifar, x,
                                  num_classes=4, **MOE_KW)
    y0, _ = fw.apply(vit_moe_cifar, shared, private, bn, x, train=False,
                     num_classes=4, **MOE_KW)

    mesh = make_mesh(n_model=4, devices=jax.devices()[:8])  # (data=2, model=4)
    ksh = shared_shardings(mesh, shared, model_sharded=True)
    assert ksh["blocks/1/moe/experts/fc1/kernel"].spec == \
        jax.sharding.PartitionSpec("model", None, None)
    sh = jax.device_put(shared, ksh)
    pr = jax.device_put(private, replicated(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    sharder = act_sharder(mesh, tokens=True, experts=True)
    y1 = jax.jit(lambda s, p, xx: fw.apply(
        vit_moe_cifar, s, p, {}, xx, train=False, act_sharder=sharder,
        num_classes=4, **MOE_KW)[0])(sh, pr, xs)
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=2e-5, atol=2e-5)


def test_sp_token_sharding_matches_replicated():
    """Pure sequence parallelism on the dense ViT: the token axis sharded
    over `model` with REPLICATED kernels — XLA all-gathers only around
    attention; LN/MLP stay chip-local. Numerics match unsharded."""
    from .helpers import tiny_vit

    x = jnp.array(np.random.RandomState(1).rand(8, 16, 16, 3), jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), tiny_vit, x,
                                  num_classes=4)
    y0, _ = fw.apply(tiny_vit, shared, private, bn, x, train=False,
                     num_classes=4)
    mesh = make_mesh(n_model=2, devices=jax.devices()[:8])  # (data=4, model=2)
    rep = replicated(mesh)
    sharder = act_sharder(mesh, tokens=True)
    y1 = jax.jit(lambda s, p, xx: fw.apply(
        tiny_vit, s, p, {}, xx, train=False, act_sharder=sharder,
        num_classes=4)[0])(
            jax.device_put(shared, rep), jax.device_put(private, rep),
            jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=2e-5, atol=2e-5)


def test_sp_text_family_matches_replicated():
    """The text family exposes the same "tokens" seam (models/text.py
    ctx.constrain): token-axis sharding over `model` with integer token
    inputs matches the unsharded forward."""
    from .helpers import tiny_textcls

    toks = jnp.array(np.random.RandomState(2).randint(0, 64, (8, 16)),
                     jnp.int32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), tiny_textcls, toks,
                                  num_classes=4)
    y0, _ = fw.apply(tiny_textcls, shared, private, bn, toks, train=False,
                     num_classes=4)
    mesh = make_mesh(n_model=2, devices=jax.devices()[:8])
    rep = replicated(mesh)
    sharder = act_sharder(mesh, tokens=True)
    y1 = jax.jit(lambda s, p, xx: fw.apply(
        tiny_textcls, s, p, {}, xx, train=False, act_sharder=sharder,
        num_classes=4)[0])(
            jax.device_put(shared, rep), jax.device_put(private, rep),
            jax.device_put(toks, batch_sharding(mesh)))
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_matches_sequential():
    """4-stage GPipe over 4 real ViT encoder blocks == running them in
    order; the stacked layout is a pure transpose of the blocks/{i}/ dict."""
    from cpg_tpu.models.vit import vit_cifar

    x = jnp.array(np.random.RandomState(0).rand(8, 16, 16, 3), jnp.float32)
    shared, private, _ = fw.init(jax.random.PRNGKey(0), vit_cifar, x,
                                 num_classes=4, depth=4, dim=32, heads=2,
                                 patch=8)
    merged = dict(shared)
    merged.update(private)
    stacked, rest = stack_block_params(merged, 4)
    assert "patch/proj/kernel" in rest and "attn/q/kernel" in stacked

    tokens = jnp.array(np.random.RandomState(1).randn(8, 4, 32), jnp.float32)
    bkw = dict(heads_n=2, head_dim=16, hidden=128)
    seq = tokens
    for i in range(4):
        seq = _default_block_fn({k: v[i] for k, v in stacked.items()}, seq,
                                jnp.float32, bkw)

    mesh = make_pipeline_mesh(4)
    out = pipeline_blocks(mesh, stacked, tokens, n_micro=4, block_kwargs=bkw)
    np.testing.assert_allclose(np.array(out), np.array(seq),
                               rtol=1e-5, atol=1e-5)
    # and compiled, with a non-trivial bubble (n_micro=2, S=4)
    out2 = jax.jit(lambda s, t: pipeline_blocks(mesh, s, t, 2, bkw))(
        stacked, tokens)
    np.testing.assert_allclose(np.array(out2), np.array(seq),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_bf16_tokens():
    """bf16 token stream through f32 compute: the loop carries must live in
    the BLOCK-OUTPUT dtype (the residual add promotes), not the input dtype
    — previously this crashed inside the fori_loop with a dtype mismatch."""
    from cpg_tpu.models.vit import vit_cifar

    x = jnp.array(np.random.RandomState(0).rand(8, 16, 16, 3), jnp.float32)
    shared, private, _ = fw.init(jax.random.PRNGKey(0), vit_cifar, x,
                                 num_classes=4, depth=4, dim=32, heads=2,
                                 patch=8)
    merged = dict(shared)
    merged.update(private)
    stacked, _ = stack_block_params(merged, 4)
    tokens = jnp.array(np.random.RandomState(1).randn(8, 4, 32),
                       jnp.bfloat16)
    bkw = dict(heads_n=2, head_dim=16, hidden=128)
    seq = tokens
    for i in range(4):
        seq = _default_block_fn({k: v[i] for k, v in stacked.items()}, seq,
                                jnp.float32, bkw)
    mesh = make_pipeline_mesh(4)
    out = pipeline_blocks(mesh, stacked, tokens, n_micro=4, block_kwargs=bkw,
                          compute_dtype=jnp.float32)
    assert out.dtype == seq.dtype
    # the carry upcast means stage inputs are exact f32 images of the bf16
    # tokens, but the sequential reference runs block-1 LN stats in bf16 —
    # agreement is at bf16 noise level, not f32
    np.testing.assert_allclose(np.array(out, np.float32),
                               np.array(seq, np.float32),
                               rtol=0.05, atol=0.05)


def test_pipeline_mesh_rejects_too_few_devices():
    import pytest

    with pytest.raises(ValueError, match="devices"):
        make_pipeline_mesh(len(jax.devices()) + 1)


def test_moe_taskserver_parity():
    """Serving is arch-generic for MoE too: bf16 server logits equal the
    predict() path; int8 PTQ (expert kernels dequantized in smoe — the
    dispatch einsums dominate, not weight bytes) keeps top-1 agreement."""
    from cpg_tpu.serve import TaskServer

    data = synthetic_task(0)
    state = init_state("tiny_moe", jax.random.PRNGKey(0))
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
    assert (np.argmax(srv8.predict(1, x), -1) == np.argmax(want, -1)).all()


def test_pipeline_rejects_bad_shapes():
    from cpg_tpu.models.vit import vit_cifar

    x = jnp.zeros((4, 16, 16, 3))
    shared, private, _ = fw.init(jax.random.PRNGKey(0), vit_cifar, x,
                                 num_classes=4, depth=3, dim=32, heads=2,
                                 patch=8)
    merged = dict(shared)
    merged.update(private)
    stacked, _ = stack_block_params(merged, 3)
    mesh = make_pipeline_mesh(2)
    tokens = jnp.zeros((4, 4, 32))
    bkw = dict(heads_n=2, head_dim=16, hidden=128)
    for bad in (lambda: pipeline_blocks(mesh, stacked, tokens, 2, bkw),
                lambda: pipeline_blocks(
                    make_pipeline_mesh(3), stacked, tokens, 3, bkw)):
        try:
            bad()
        except ValueError:
            continue
        else:  # depth 3 % 2 stages; batch 4 % 3 micro
            raise AssertionError("expected ValueError")
