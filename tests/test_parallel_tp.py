"""TP-flavored channel sharding: kernels (+ownership+piggymask) sharded along
output channels on the model axis must reproduce single-device numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.core.pruner import one_shot_prune
from cpg_tpu.parallel.mesh import (batch_sharding, make_mesh, replicated,
                                   shared_shardings)
from cpg_tpu.train.sequence import init_state, start_task
from cpg_tpu.train.step import TrainConfig, build_train_step

from .helpers import normalize01, synthetic_task, tiny_cnn


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
