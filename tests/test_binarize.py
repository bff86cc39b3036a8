"""Binarizer/Ternarizer semantics (ref:models/layers.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from cpg_tpu.ops.binarize import (DEFAULT_THRESHOLD, binarize, init_piggymask,
                                  ternarize)


def test_binarize_forward_threshold():
    x = jnp.array([-1.0, 0.0, 4.9e-3, 5e-3, 5.1e-3, 1.0])
    out = binarize(x)
    # strict '>' at the threshold: 5e-3 itself is OFF
    np.testing.assert_array_equal(out, [0, 0, 0, 0, 1, 1])


def test_binarize_straight_through_gradient():
    x = jnp.array([-0.5, 0.001, 0.5])
    g = jax.grad(lambda m: jnp.sum(binarize(m) * jnp.array([2.0, 3.0, 4.0])))(x)
    # STE: grad passes through as if binarize were identity
    np.testing.assert_allclose(g, [2.0, 3.0, 4.0])


def test_binarize_under_jit_and_vmap():
    x = jnp.linspace(-1, 1, 16).reshape(4, 4)
    np.testing.assert_array_equal(jax.jit(binarize)(x), binarize(x))


def test_ternarize():
    x = jnp.array([-0.2, 0.0, 0.004, 0.006])
    np.testing.assert_array_equal(ternarize(x), [-1, 0, 0, 1])
    g = jax.grad(lambda m: jnp.sum(ternarize(m) * 2.0))(x)
    np.testing.assert_allclose(g, jnp.full_like(x, 2.0))


def test_piggymask_init_above_threshold():
    pm = init_piggymask((3, 3))
    assert jnp.all(binarize(pm) == 1.0)  # all prior weights initially picked
    assert pm.dtype == jnp.float32
    assert float(pm[0, 0]) > DEFAULT_THRESHOLD
