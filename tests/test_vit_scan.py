"""scan_blocks (models/vit.scan_vit_blocks): one lax.scan over stacked
per-block params must match the unrolled block loop — it is the SAME block
math on the SAME dict entries, only the compiled program shape changes
(one block body instead of `depth` copies; the remote-compile-failure fix
for deep/large-batch ViT programs, PERF_vit_remat_r4.json)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.models import framework as fw
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step

from .helpers import normalize01, synthetic_task, tiny_vit


def test_scan_forward_matches_unrolled():
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3),
                    jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), tiny_vit, x,
                                  num_classes=4)
    for train in (True, False):
        y0, _ = fw.apply(tiny_vit, shared, private, bn, x, train=train,
                         num_classes=4)
        y1, _ = fw.apply(tiny_vit, shared, private, bn, x, train=train,
                         scan_blocks=True, num_classes=4)
        np.testing.assert_allclose(np.array(y0), np.array(y1),
                                   rtol=1e-6, atol=1e-6)


def _run_steps(cfg, n_steps=3):
    data = synthetic_task(0)
    state = init_state("tiny_vit", jax.random.PRNGKey(0))
    start_task(state, "a", 4, jax.random.PRNGKey(1))
    step, (opt_w, opt_pm) = build_train_step(
        tiny_vit, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
        augment_fn=lambda x, r: normalize01(x))
    t = state.tasks[1]
    ows = opt_w.init({"shared": state.shared, "private": t.private})
    opms = opt_pm.init({})
    shared, priv, bn = state.shared, t.private, t.bn_state
    jstep = jax.jit(step)
    for i in range(n_steps):
        x = jnp.asarray(data["train_x"][i * 32:(i + 1) * 32])
        y = jnp.asarray(data["train_y"][i * 32:(i + 1) * 32])
        shared, _, priv, bn, ows, opms, metrics = jstep(
            shared, {}, priv, bn, ows, opms, state.ownership, 1, x, y,
            jax.random.PRNGKey(3), i)
    return shared, metrics


def test_scan_train_step_matches_unrolled():
    """Gradients flow back through jnp.stack's transpose to the flat
    per-block entries: multi-step training parity, optimizer included."""
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    sh0, m0 = _run_steps(cfg)
    sh1, m1 = _run_steps(dataclasses.replace(cfg, scan_blocks=True))
    np.testing.assert_allclose(np.array(m0["loss"]), np.array(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    for k in sh0:
        np.testing.assert_allclose(np.array(sh0[k]), np.array(sh1[k]),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_scan_remat_matches_scan():
    """remat + scan_blocks = per-block jax.checkpoint inside the scan body:
    same math, per-block residuals only."""
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32, scan_blocks=True)
    sh0, m0 = _run_steps(cfg)
    sh1, m1 = _run_steps(dataclasses.replace(cfg, remat=True))
    np.testing.assert_allclose(np.array(m0["loss"]), np.array(m1["loss"]),
                               rtol=1e-6, atol=1e-7)
    for k in sh0:
        np.testing.assert_allclose(np.array(sh0[k]), np.array(sh1[k]),
                                   rtol=1e-6, atol=1e-7, err_msg=k)


def test_scan_bf16_carry_dtype():
    """The scan carry is dtype-strict — it caught a real framework bug:
    sdense/sconv added the f32 private bias WITHOUT casting, silently
    promoting every transformer activation (residual stream included) to
    f32 under bf16 compute — 2x the HBM bytes on every residual/LN read.
    Biases now cast to the output dtype; this test pins both (scan runs at
    bf16 at all = no f32 leak into the carry)."""
    x = jnp.asarray(np.random.RandomState(0).randn(4, 16, 16, 3),
                    jnp.float32)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), tiny_vit, x,
                                  num_classes=4)
    y0, _ = fw.apply(tiny_vit, shared, private, bn, x, train=True,
                     compute_dtype=jnp.bfloat16, num_classes=4)
    y1, _ = fw.apply(tiny_vit, shared, private, bn, x, train=True,
                     compute_dtype=jnp.bfloat16, scan_blocks=True,
                     num_classes=4)
    # bf16 programs differ (scan vs unrolled) — compiler reassociation
    # drift at bf16 scale is expected; the invariant is "runs + agrees to
    # bf16 precision", the f32 bit-parity lives in the tests above
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=0.02, atol=0.02)


def test_scan_textcls_matches_unrolled():
    """textcls shares the homogeneous stack (and the causal mask must ride
    into the scanned body)."""
    from cpg_tpu.models.text import textcls

    ids = jnp.asarray(np.random.RandomState(1).randint(0, 64, (4, 16)))
    kw = dict(num_classes=4, depth=2, dim=32, heads=2, vocab=64, causal=True)
    shared, private, bn = fw.init(jax.random.PRNGKey(0), textcls,
                                  jnp.zeros((4, 16)), **kw)
    y0, _ = fw.apply(textcls, shared, private, bn, ids, train=False, **kw)
    y1, _ = fw.apply(textcls, shared, private, bn, ids, train=False,
                     scan_blocks=True, **kw)
    np.testing.assert_allclose(np.array(y0), np.array(y1),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 fake devices")
def test_scan_tp_sp_matches_single_device():
    """scan_blocks composes with the parallel axes: kernels TP-sharded on
    the model axis + the 'tokens' SP seam constrained INSIDE the scan body
    must reproduce unsharded scan numerics."""
    from cpg_tpu.parallel.mesh import (act_sharder, batch_sharding,
                                       make_mesh, replicated,
                                       shared_shardings)

    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32, scan_blocks=True)

    def build(cfg):
        state = init_state("tiny_vit", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        step, (opt_w, opt_pm) = build_train_step(
            tiny_vit, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
            augment_fn=lambda x, r: normalize01(x))
        t = state.tasks[1]
        ows = opt_w.init({"shared": state.shared, "private": t.private})
        opms = opt_pm.init({})
        return state, t, step, ows, opms

    x = jnp.asarray(data["train_x"][:32])
    y = jnp.asarray(data["train_y"][:32])
    rng = jax.random.PRNGKey(3)

    state, t, step, ows, opms = build(cfg)
    ref = jax.jit(step)(state.shared, {}, t.private, t.bn_state, ows, opms,
                        state.ownership, 1, x, y, rng, 0)

    mesh = make_mesh(n_model=2, devices=jax.devices()[:4])
    cfg_p = dataclasses.replace(
        cfg, act_sharder=act_sharder(mesh, tokens=True))
    state2, t2, step2, ows2, opms2 = build(cfg_p)
    ksh = shared_shardings(mesh, state2.shared, model_sharded=True)
    rep = replicated(mesh)
    shared = jax.device_put(state2.shared, ksh)
    own = jax.device_put(state2.ownership, ksh)
    priv = jax.tree.map(lambda a: jax.device_put(a, rep), t2.private)
    bn = jax.tree.map(lambda a: jax.device_put(a, rep), t2.bn_state)
    ows2 = jax.tree.map(lambda a: jax.device_put(a, rep), ows2)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    got = jax.jit(step2)(shared, {}, priv, bn, ows2, opms2, own, 1, xs, ys,
                         rng, 0)

    np.testing.assert_allclose(float(ref[-1]["loss"]),
                               float(got[-1]["loss"]), rtol=1e-5)
    for k in ref[0]:
        np.testing.assert_allclose(np.array(ref[0][k]), np.array(got[0][k]),
                                   rtol=3e-4, atol=3e-6, err_msg=k)


def test_scan_rejects_masked_path():
    """scan_blocks requires the default effective-params path — the raw-
    weight Masking (Pallas) and int8 serving paths select weights by NAME
    inside the block, which the stacked slices do not thread."""
    x = jnp.zeros((2, 16, 16, 3))
    shared, private, bn = fw.init(jax.random.PRNGKey(0), tiny_vit, x,
                                  num_classes=4)
    own = {k: jnp.ones(v.shape, jnp.int8) for k, v in shared.items()}
    masking = fw.Masking(ownership=own, piggymask=None, task_id=1)
    with pytest.raises(ValueError, match="scan_blocks"):
        fw.apply(tiny_vit, shared, private, bn, x, train=False,
                 masking=masking, scan_blocks=True, num_classes=4)
