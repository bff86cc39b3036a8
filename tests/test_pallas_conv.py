"""Fused masked conv vs XLA oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.ops.pallas.masked_conv import (masked_conv2d,
                                            masked_conv2d_reference)


def _case(n, h, w_, cin, cout, k, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w_, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))
    own = jnp.asarray(rng.choice([0, 1, 2, 3], size=w.shape).astype(np.int8))
    pm = jnp.asarray(rng.randn(*w.shape).astype(np.float32) * 0.01)
    return x, w, own, pm


@pytest.mark.parametrize("cfg", [(2, 8, 8, 16, 32, 3, 1),
                                 (1, 16, 16, 8, 16, 3, 2),
                                 (2, 8, 8, 4, 8, 1, 1)])
def test_conv_matches_oracle(cfg):
    n, h, w_, cin, cout, k, s = cfg
    x, w, own, pm = _case(n, h, w_, cin, cout, k)
    got = masked_conv2d(x, w, own, pm, 2, stride=s)
    want = masked_conv2d_reference(x, w, own, pm, 2, stride=s)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.array(got), np.array(want), rtol=1e-4,
                               atol=1e-4)


def test_conv_gradients_flow():
    x, w, own, pm = _case(1, 8, 8, 8, 8, 3)

    def loss(x, w, pm):
        return jnp.sum(masked_conv2d(x, w, own, pm, 2) ** 2)

    gx, gw, gpm = jax.grad(loss, argnums=(0, 1, 2))(x, w, pm)
    assert float(jnp.abs(gx).sum()) > 0
    # dw gated to own==2; dpm only on prior entries
    assert float(jnp.abs(jnp.where(own == 2, 0.0, gw)).max()) == 0.0
    prior = (own > 0) & (own < 2)
    assert float(jnp.abs(jnp.where(prior, 0.0, gpm)).max()) == 0.0
