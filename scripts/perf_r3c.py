"""Round-3 perf, part 3: donated jit + scoped-VMEM compiler option."""
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

BATCH = 8192


def run_variant(opts, warmup=4, iters=10):
    import __graft_entry__ as ge
    from cpg_tpu.data.augment import cifar_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, build_train_step

    cfg = TrainConfig(compute_dtype=jnp.bfloat16)
    state = ge._build_state(arch="vgg16_bn_cifar", mult=1.0, num_classes=5,
                            seed=0)
    task = state.tasks[2]
    model_fn, in_shape = get_model("vgg16_bn_cifar")
    raw, (opt_w, opt_pm) = build_train_step(
        model_fn, num_classes=5, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=cifar_train_augment)
    step = jax.jit(raw, donate_argnums=(0, 1, 2, 3, 4, 5),
                   compiler_options=opts or None)
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(task.piggymask)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (BATCH, *in_shape), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    y = jax.random.randint(rng, (BATCH,), 0, 5, jnp.int32)
    x, y = jax.device_put(x), jax.device_put(y)
    shared, pm, priv, bn = (state.shared, task.piggymask, task.private,
                            task.bn_state)
    own = state.ownership

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
    return 1e3 * (time.perf_counter() - t0) / iters


def main():
    out = {}
    for name, opts in [
        ("donated_default", {}),
        ("donated_vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("donated_vmem96m", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ]:
        try:
            ms = run_variant(opts)
            out[name] = {"ms": round(ms, 2), "ips": round(BATCH * 1e3 / ms, 0)}
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
