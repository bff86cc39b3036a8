"""Round-3 perf experiments at the roofline frontier (VERDICT r2 #5).

r2 roofline: the masked VGG16-BN train step is HBM-bound — 11.9 GB/step at
b8192, measured ~18% above the pure-bandwidth floor. This script measures the
cheap byte-cutting levers on the real chip and prints one JSON line per
experiment; RESULTS.md records the outcome either way.

Levers:
  1. batch 16384 (amortize fixed weight-shaped streams further)
  2. bf16 piggymasks (+ bf16 Adam moments): halves the mask-select stream
     and 3 of the 4 Adam-state streams (weight-shaped, matters at small batch)
  3. combined
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])


def time_step(batch, warmup, iters, pm_dtype=None):
    import __graft_entry__ as ge
    from cpg_tpu.data.augment import cifar_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, make_train_step

    cfg = TrainConfig(compute_dtype=jnp.bfloat16)
    state = ge._build_state(arch="vgg16_bn_cifar", mult=1.0, num_classes=5,
                            seed=0)
    task = state.tasks[2]
    model_fn, in_shape = get_model("vgg16_bn_cifar")
    step, (opt_w, opt_pm) = make_train_step(
        model_fn, num_classes=5, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=cifar_train_augment)
    pm = task.piggymask
    if pm_dtype is not None:
        pm = jax.tree.map(lambda a: a.astype(pm_dtype), pm)
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(pm)

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (batch, *in_shape), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    y = jax.random.randint(rng, (batch,), 0, 5, jnp.int32)
    x, y = jax.device_put(x), jax.device_put(y)
    shared, priv, bn, own = (state.shared, task.private, task.bn_state,
                             state.ownership)

    bytes_accessed = None
    try:
        ca = step.lower(shared, pm, priv, bn, ows, opms, own, 2, x, y,
                        rng, 0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        bytes_accessed = float(ca.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    def run(n):
        nonlocal shared, pm, priv, bn, ows, opms, rng
        m = None
        for i in range(n):
            rng, sub = jax.random.split(rng)
            (shared, pm, priv, bn, ows, opms, m) = step(
                shared, pm, priv, bn, ows, opms, own, 2, x, y, sub, i)
        return float(m["loss"])

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    return ms, bytes_accessed


def main():
    out = {}
    for name, kw in [
        ("b8192_default", dict(batch=8192, warmup=4, iters=8)),
        ("b8192_pm_bf16", dict(batch=8192, warmup=4, iters=8,
                               pm_dtype=jnp.bfloat16)),
        ("b16384_default", dict(batch=16384, warmup=3, iters=6)),
        ("b16384_pm_bf16", dict(batch=16384, warmup=3, iters=6,
                                pm_dtype=jnp.bfloat16)),
        ("b1024_default", dict(batch=1024, warmup=8, iters=20)),
        ("b1024_pm_bf16", dict(batch=1024, warmup=8, iters=20,
                               pm_dtype=jnp.bfloat16)),
    ]:
        try:
            ms, by = time_step(**kw)
            b = kw["batch"]
            out[name] = {"ms": round(ms, 2), "ips": round(b * 1e3 / ms, 0),
                         "gb": round(by / 1e9, 2) if by else None}
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}: {str(e)[:200]}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
