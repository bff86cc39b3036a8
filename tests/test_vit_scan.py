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
