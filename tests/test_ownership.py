"""Ownership transitions + effective-weight selection + gradient gating."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.core import ownership as own_mod
from cpg_tpu.core.gating import gate_and_decay, gate_piggymask_grads
from cpg_tpu.core.ownership import OWN_DTYPE, assign_free_to_task, init_ownership
from cpg_tpu.ops.binarize import init_piggymask
from cpg_tpu.ops.masked import effective_kernel, effective_params


def test_assign_free_to_task():
    shared = {"a/kernel": jnp.zeros((2, 3))}
    own = init_ownership(shared)
    assert own["a/kernel"].dtype == OWN_DTYPE
    own1 = assign_free_to_task(own, 1)
    assert int((own1["a/kernel"] == 1).sum()) == 6
    # pruning released one entry; task 2 claims only that one
    own1 = own1["a/kernel"].at[0, 0].set(0)
    own2 = assign_free_to_task({"a/kernel": own1}, 2)["a/kernel"]
    assert int(own2[0, 0]) == 2 and int((own2 == 1).sum()) == 5


def test_effective_kernel_task1():
    w = jnp.array([1.0, 2.0, 3.0])
    own = jnp.array([1, 0, 1], OWN_DTYPE)
    eff = effective_kernel(w, own, None, 1)
    np.testing.assert_array_equal(eff, [1.0, 0.0, 3.0])


def test_effective_kernel_visibility_rule():
    # ref:pruner.py apply_mask — task t sees 0 < own <= t, with prior entries
    # gated by the binarized piggymask.
    w = jnp.array([1.0, 2.0, 3.0, 4.0, 5.0])
    own = jnp.array([1, 2, 0, 3, 2], OWN_DTYPE)
    pm = jnp.array([0.5, -0.5, 0.9, 0.9, 0.9])  # on/off pattern for priors
    eff = effective_kernel(w, own, pm, 2)
    # own==1 & pm on -> 1.0 ; own==2 -> full ; free -> 0 ; own==3 (future) -> 0
    np.testing.assert_array_equal(eff, [1.0, 2.0, 0.0, 0.0, 5.0])
    eff_off = effective_kernel(w, own, pm.at[0].set(-0.5), 2)
    np.testing.assert_array_equal(eff_off, [0.0, 2.0, 0.0, 0.0, 5.0])


def test_piggymask_gradient_reaches_subthreshold_entries():
    w = jnp.array([2.0, 3.0])
    own = jnp.array([1, 1], OWN_DTYPE)
    pm = jnp.array([1e-4, 0.9])  # first entry OFF but must still get grad

    def loss(pm):
        return jnp.sum(effective_kernel(w, own, pm, 2) * jnp.array([10.0, 100.0]))

    g = jax.grad(loss)(pm)
    np.testing.assert_allclose(g, [20.0, 300.0])  # g * w via STE


def test_gate_and_decay():
    shared = {"a/kernel": jnp.array([1.0, 2.0, 3.0])}
    ownership = {"a/kernel": jnp.array([2, 1, 2], OWN_DTYPE)}
    grads = {"a/kernel": jnp.array([0.1, 0.2, 0.3])}
    gated = gate_and_decay(grads, shared, ownership, 2, weight_decay=0.5)
    # wd added on owned entries only; frozen entries exactly zero
    np.testing.assert_allclose(gated["a/kernel"], [0.1 + 0.5, 0.0, 0.3 + 1.5])


def test_gate_piggymask_grads():
    ownership = {"a/kernel": jnp.array([1, 2, 0], OWN_DTYPE)}
    g = {"a/kernel": jnp.array([1.0, 1.0, 1.0])}
    gated = gate_piggymask_grads(g, ownership, 2)
    np.testing.assert_array_equal(gated["a/kernel"], [1.0, 0.0, 0.0])


def test_effective_params_pytree_and_stats():
    shared = {"a/kernel": jnp.ones((4, 4)), "b/kernel": jnp.ones((2, 2))}
    own = init_ownership(shared)
    own = assign_free_to_task(own, 1)
    pm = {k: init_piggymask(v.shape) for k, v in shared.items()}
    eff = effective_params(shared, own, pm, 2, compute_dtype=jnp.bfloat16)
    assert eff["a/kernel"].dtype == jnp.bfloat16
    # all entries owned by task 1 and picked -> pass through
    np.testing.assert_allclose(np.array(eff["a/kernel"], np.float32), 1.0)
    assert float(own_mod.used_ratio(own)) == 1.0
    assert float(own_mod.task_ratio(own, 1)) == 1.0
    assert float(own_mod.free_ratio(own)) == 0.0
