"""Round-3 perf, part 2: TPU compiler-option sweep on the b8192 step.

The step is HBM-bound; fusion depth is controlled by the scoped-VMEM budget.
AOT-compile the same step with different xla_tpu options and time each
executable (same inputs, same chip)."""

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


def build():
    import __graft_entry__ as ge
    from cpg_tpu.data.augment import cifar_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, build_train_step

    cfg = TrainConfig(compute_dtype=jnp.bfloat16)
    state = ge._build_state(arch="vgg16_bn_cifar", mult=1.0, num_classes=5,
                            seed=0)
    task = state.tasks[2]
    model_fn, in_shape = get_model("vgg16_bn_cifar")
    step, (opt_w, opt_pm) = build_train_step(
        model_fn, num_classes=5, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=cifar_train_augment)
    ows = opt_w.init({"shared": state.shared, "private": task.private})
    opms = opt_pm.init(task.piggymask)
    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (BATCH, *in_shape), 0, 256,
                           jnp.int32).astype(jnp.uint8)
    y = jax.random.randint(rng, (BATCH,), 0, 5, jnp.int32)
    args = [state.shared, task.piggymask, task.private, task.bn_state, ows,
            opms, state.ownership, 2, jax.device_put(x), jax.device_put(y),
            rng, 0]
    return step, args


def time_exec(step, args, options, warmup=3, iters=8):
    lowered = jax.jit(step).lower(*args)
    compiled = lowered.compile(compiler_options=options or None)
    a = list(args)

    def run(n):
        m = None
        rng = a[10]
        for i in range(n):
            rng, sub = jax.random.split(rng)
            out = compiled(a[0], a[1], a[2], a[3], a[4], a[5], a[6], 2,
                           a[8], a[9], sub, i)
            (a[0], a[1], a[2], a[3], a[4], a[5], m) = out
        a[10] = rng
        return float(m["loss"])

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    return 1e3 * (time.perf_counter() - t0) / iters


def main():
    step, args = build()
    variants = [
        ("default", {}),
        ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
        ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("no_rematerialization",
         {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"}),
    ]
    out = {}
    for name, opts in variants:
        try:
            # fresh state per variant: donation consumes the buffers
            step, args = build()
            ms = time_exec(step, args, opts)
            out[name] = {"ms": round(ms, 2),
                         "ips": round(BATCH * 1e3 / ms, 0)}
        except Exception as e:
            out[name] = f"failed: {type(e).__name__}: {str(e)[:160]}"
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
