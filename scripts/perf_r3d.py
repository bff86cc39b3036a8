"""Round-3 perf, part 4: scoped-VMEM across batch sizes and models."""
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

VMEM = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def time_step(arch, batch, warmup, iters, opts, num_classes=5, aug="cifar",
              grad_clip=None):
    import dataclasses

    import __graft_entry__ as ge
    from cpg_tpu.data.augment import cifar_train_augment, face_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, make_train_step

    cfg = TrainConfig(compute_dtype=jnp.bfloat16, grad_clip_norm=grad_clip,
                      compiler_options=opts or None)
    state = ge._build_state(arch=arch, mult=1.0, num_classes=num_classes,
                            seed=0)
    task = state.tasks[2]
    model_fn, in_shape = get_model(arch)
    step, (opt_w, opt_pm) = make_train_step(
        model_fn, num_classes=num_classes, mult=1.0, has_piggymask=True,
        cfg=cfg,
        augment_fn=cifar_train_augment if aug == "cifar"
        else face_train_augment)
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(task.piggymask)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (batch, *in_shape), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    y = jax.random.randint(rng, (batch,), 0, num_classes, jnp.int32)
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
    for name, kw in [
        ("vgg_b16384_vmem64m", dict(arch="vgg16_bn_cifar", batch=16384,
                                    warmup=3, iters=6, opts=VMEM)),
        ("vgg_b1024_vmem64m", dict(arch="vgg16_bn_cifar", batch=1024,
                                   warmup=8, iters=20, opts=VMEM)),
        ("sphere_b256_vmem64m", dict(arch="spherenet20", batch=256, warmup=5,
                                     iters=15, opts=VMEM, num_classes=64,
                                     aug="face", grad_clip=5.0)),
        ("sphere_b256_default", dict(arch="spherenet20", batch=256, warmup=5,
                                     iters=15, opts=None, num_classes=64,
                                     aug="face", grad_clip=5.0)),
    ]:
        try:
            ms = time_step(**kw)
            out[name] = {"ms": round(ms, 2),
                         "ips": round(kw["batch"] * 1e3 / ms, 0)}
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
