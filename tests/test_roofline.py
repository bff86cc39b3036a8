"""The shared roofline model (cpg_tpu/utils/roofline.py) — VERDICT r3 weak
#1: fractions of floor above 1.0 must be impossible, the byte-model
overcount must be flagged not hidden, and spec vs measured ceilings must
both be reported."""

import json

import numpy as np

from cpg_tpu.utils.roofline import SPEC, cost_of, load_measured, roofline


def test_fraction_never_above_one():
    # a byte count so inflated the "floor" exceeds the measured time
    cost = {"bytes": 100e9, "flops": 1e12}  # byte floor @spec = 122 ms
    r = roofline(step_ms=10.0, cost=cost)
    assert r["fraction_of_spec_floor"] <= 1.0
    assert r["fraction_of_spec_floor_raw"] > 1.0  # forensics preserved
    assert "byte_model_suspect" in r
    # the clamped fraction falls back to the trusted flop floor
    flop_floor_ms = 1e12 / (SPEC["bf16_tflops"] * 1e12) * 1e3
    np.testing.assert_allclose(r["fraction_of_spec_floor"],
                               round(flop_floor_ms / 10.0, 3))


def test_honest_fraction_passes_through():
    cost = {"bytes": 1e9, "flops": 10e12}  # flop-bound, floor ~50.8 ms
    r = roofline(step_ms=100.0, cost=cost)
    assert r["spec"]["bound"] == "mxu"
    assert 0 < r["fraction_of_spec_floor"] < 1.0
    assert "byte_model_suspect" not in r
    assert "fraction_of_spec_floor_raw" not in r
    # mfu = flops / time / peak
    np.testing.assert_allclose(
        r["mfu_vs_spec"], round(10e12 / 0.1 / (SPEC["bf16_tflops"] * 1e12),
                                3))


def test_measured_ceilings_reported_alongside_spec(tmp_path):
    probe = {"hbm": {"gbps": 600.0}, "mxu_bf16": {"tflops": 120.0}}
    p = tmp_path / "ENV_PROBE_r9.json"
    p.write_text(json.dumps(probe))
    measured = load_measured(path=str(p))
    assert measured == {"hbm_gbps": 600.0, "bf16_tflops": 120.0,
                        "source": "ENV_PROBE_r9.json"}
    cost = {"bytes": 50e9, "flops": 5e12}
    r = roofline(step_ms=100.0, cost=cost, measured=measured)
    # measured ceilings are lower -> measured floors higher -> fraction up
    assert r["fraction_of_measured_floor"] > r["fraction_of_spec_floor"]
    assert r["measured"]["hbm_floor_ms"] > r["spec"]["hbm_floor_ms"]
    assert r["fraction_of_measured_floor"] <= 1.0


def test_no_cost_no_crash():
    assert roofline(10.0, None) == {}
    assert roofline(0.0, {"bytes": 1e9}) == {}


def test_cost_of_compiled_program():
    """cost_of on a real compiled XLA program: exact flop count for one
    matmul (2*M*N*K), so the flop floor is an op-count truth, not a guess."""
    import jax
    import jax.numpy as jnp

    m = jax.jit(lambda a, b: a @ b)
    a = jnp.zeros((128, 256), jnp.float32)
    b = jnp.zeros((256, 64), jnp.float32)
    cost = cost_of(m.lower(a, b).compile())
    if cost is None:  # backend without a cost model: nothing to assert
        return
    assert cost["flops"] >= 2 * 128 * 256 * 64
    assert cost["bytes"] is None or cost["bytes"] > 0
