"""Round-3 perf, part 5: selective remat (remat_policy='convs').

The step is HBM-bound (RESULTS.md roofline); the policy saves ONLY
sconv/sdense outputs as backward residuals and recomputes BN/ReLU/pool
epilogues from them — no conv recompute (global remat's measured failure
mode: +25%), but the second activation-sized residual per layer is never
written. Measures ms/step AND the compiled program's logical bytes so the
byte delta is visible even if wall-clock is noise.
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

VMEM = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def time_step(arch, batch, warmup, iters, num_classes=5, mult=1.0,
              remat_policy=None, remat=False, opts=VMEM):
    import __graft_entry__ as ge
    from cpg_tpu.data.augment import cifar_train_augment, imagenet_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, make_train_step

    augment_fn = (imagenet_train_augment if arch == "resnet50"
                  else cifar_train_augment)
    cfg = TrainConfig(compute_dtype=jnp.bfloat16, compiler_options=opts,
                      remat_policy=remat_policy, remat=remat)
    state = ge._build_state(arch=arch, mult=mult, num_classes=num_classes,
                            seed=0)
    task = state.tasks[2]
    model_fn, in_shape = get_model(arch)
    step, (opt_w, opt_pm) = make_train_step(
        model_fn, num_classes=num_classes, mult=mult, has_piggymask=True,
        cfg=cfg, augment_fn=augment_fn)
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

    gb = None
    try:
        ca = step.lower(shared, pm, priv, bn, ows, opms, own, 2, x, y,
                        rng, 0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        gb = float(ca.get("bytes accessed", 0.0)) / 1e9 or None
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
    return ms, gb


def main():
    out = {}
    for name, kw in [
        ("vgg_b8192_default", dict(arch="vgg16_bn_cifar", batch=8192,
                                   warmup=4, iters=8)),
        ("vgg_b8192_rematconvs", dict(arch="vgg16_bn_cifar", batch=8192,
                                      warmup=4, iters=8,
                                      remat_policy="convs")),
        ("vgg_b1024_default", dict(arch="vgg16_bn_cifar", batch=1024,
                                   warmup=8, iters=20)),
        ("vgg_b1024_rematconvs", dict(arch="vgg16_bn_cifar", batch=1024,
                                      warmup=8, iters=20,
                                      remat_policy="convs")),
        ("resnet50_b128_default", dict(arch="resnet50", batch=128, warmup=4,
                                       iters=10, num_classes=30)),
        ("resnet50_b128_rematconvs", dict(arch="resnet50", batch=128,
                                          warmup=4, iters=10, num_classes=30,
                                          remat_policy="convs")),
    ]:
        try:
            ms, gb = time_step(**kw)
            out[name] = {"ms": round(ms, 2),
                         "ips": round(kw["batch"] * 1e3 / ms, 0),
                         "compiled_gb": round(gb, 2) if gb else None}
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
