"""Remat step must match the plain step bit-for-bit (same math, less HBM)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step

from .helpers import normalize01, synthetic_task, tiny_cnn


def test_remat_step_matches_plain():
    data = synthetic_task(0)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)

    def run(cfg):
        state = init_state("tiny_cnn", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        step, (opt_w, opt_pm) = build_train_step(
            tiny_cnn, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
            augment_fn=lambda x, r: normalize01(x))
        t = state.tasks[1]
        ows = opt_w.init({"shared": state.shared, "private": t.private})
        opms = opt_pm.init({})
        x = jnp.asarray(data["train_x"][:32])
        y = jnp.asarray(data["train_y"][:32])
        out = jax.jit(step)(state.shared, {}, t.private, t.bn_state, ows,
                            opms, state.ownership, 1, x, y,
                            jax.random.PRNGKey(3), 0)
        return out

    plain = run(cfg)
    remat = run(dataclasses.replace(cfg, remat=True))
    np.testing.assert_array_equal(
        np.array(plain[-1]["loss"]), np.array(remat[-1]["loss"]))
    for k in plain[0]:
        np.testing.assert_array_equal(np.array(plain[0][k]),
                                      np.array(remat[0][k]))
    # Selective remat ('convs': save only sconv/sdense outputs, recompute
    # BN/ReLU epilogues in backward) — same math, fewer residual bytes.
    sel = run(dataclasses.replace(cfg, remat_policy="convs"))
    np.testing.assert_array_equal(
        np.array(plain[-1]["loss"]), np.array(sel[-1]["loss"]))
    for k in plain[0]:
        np.testing.assert_array_equal(np.array(plain[0][k]),
                                      np.array(sel[0][k]))


def test_remat_policy_validation():
    import pytest

    from cpg_tpu.train.step import remat_policy

    with pytest.raises(ValueError):
        remat_policy("nope")
    cfg = TrainConfig(remat=True, remat_policy="convs")
    with pytest.raises(ValueError):
        build_train_step(tiny_cnn, num_classes=4, mult=1.0,
                         has_piggymask=False, cfg=cfg)


def test_unfuse_gating_matches_plain():
    """TrainConfig.unfuse_gating is a pure scheduling barrier
    (lax.optimization_barrier between grads and the gating selects) — the
    step math must be bit-identical with it on."""
    data = synthetic_task(1)
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)

    def run(cfg):
        state = init_state("tiny_cnn", jax.random.PRNGKey(0))
        start_task(state, "a", 4, jax.random.PRNGKey(1))
        step, (opt_w, opt_pm) = build_train_step(
            tiny_cnn, num_classes=4, mult=1.0, has_piggymask=False, cfg=cfg,
            augment_fn=lambda x, r: normalize01(x))
        t = state.tasks[1]
        ows = opt_w.init({"shared": state.shared, "private": t.private})
        opms = opt_pm.init({})
        x = jnp.asarray(data["train_x"][:32])
        y = jnp.asarray(data["train_y"][:32])
        return jax.jit(step)(state.shared, {}, t.private, t.bn_state, ows,
                             opms, state.ownership, 1, x, y,
                             jax.random.PRNGKey(3), 0)

    plain = run(cfg)
    barr = run(dataclasses.replace(cfg, unfuse_gating=True))
    np.testing.assert_array_equal(np.array(plain[-1]["loss"]),
                                  np.array(barr[-1]["loss"]))
    for k in plain[0]:
        np.testing.assert_array_equal(np.array(plain[0][k]),
                                      np.array(barr[0][k]))
    # unfuse_bn_bwd: identity forward + scheduling-only backward barrier on
    # every sconv input — also bit-identical
    bnb = run(dataclasses.replace(cfg, unfuse_bn_bwd=True))
    np.testing.assert_array_equal(np.array(plain[-1]["loss"]),
                                  np.array(bnb[-1]["loss"]))
    for k in plain[0]:
        np.testing.assert_array_equal(np.array(plain[0][k]),
                                      np.array(bnb[0][k]))
