"""Measure the VMEM-resident fused BN+ReLU+conv chain on the real chip.

Two levels, one JSON line per experiment:

A. Kernel microbench per VGG boundary shape (fwd only): the Pallas fused
   kernel vs the XLA unfused chain (affine+relu materialized, then conv).
   In-graph fori_loop with a data-dependent carry — relay dispatch is
   ~0.5-1.4 ms and block5 runs sub-ms (CLAUDE.md).
B. Full masked VGG16-BN train step at b8192 bf16: TrainConfig(
   use_fused_chain=True) vs default, both with the production scoped-VMEM
   64 MiB compiler option, compiled bytes recorded.

Usage: python scripts/perf_fused_chain.py [micro|step|all]
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

SCOPED = {"xla_tpu_scoped_vmem_limit_kib": "65536"}

# (batch, H, W, Cin, Cout) for every fusable VGG16-CIFAR boundary at b8192
SHAPES = [
    ("block1", 8192, 32, 32, 64, 64),
    ("block2", 8192, 16, 16, 128, 128),
    ("block3", 8192, 8, 8, 256, 256),
    ("block4", 8192, 4, 4, 512, 512),
    ("block5", 8192, 2, 2, 512, 512),
]


def _loop(op, iters):
    """op(x, a, b, w) iterated with a data-dependent scalar carry so the
    whole chain must execute before the host readback."""
    def f(x, a, b, w):
        def body(_, carry):
            s = carry
            y = op(x + s.astype(x.dtype), a, b, w)
            return jnp.max(jnp.abs(y)).astype(jnp.float32) * 1e-38

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return jax.jit(f)


def micro(iters=20):
    from cpg_tpu.ops.pallas.fused_chain import (fused_affine_relu_conv,
                                                fused_oracle)

    out = {}
    for name, n, h, w, cin, cout in SHAPES:
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        x = jax.random.normal(ks[0], (n, h, w, cin), jnp.bfloat16)
        a = jax.random.uniform(ks[1], (cin,), jnp.float32, 0.5, 1.5)
        b = jax.random.normal(ks[2], (cin,), jnp.float32) * 0.3
        wt = (jax.random.normal(ks[3], (3, 3, cin, cout), jnp.float32) * 0.05)
        row = {}
        for label, op in (("pallas", lambda *A: fused_affine_relu_conv(
                              *A, jnp.bfloat16)),
                          ("xla", lambda *A: fused_oracle(*A, jnp.bfloat16))):
            f = _loop(op, iters)
            float(f(x, a, b, wt))  # compile + warm
            t0 = time.perf_counter()
            float(f(x, a, b, wt))
            ms = 1e3 * (time.perf_counter() - t0) / iters
            flops = 2 * n * h * w * 9 * cin * cout
            row[label] = {"ms": round(ms, 3),
                          "tflops": round(flops / ms / 1e9, 1)}
        row["speedup"] = round(row["xla"]["ms"] / row["pallas"]["ms"], 3)
        out[name] = row
        print(json.dumps({name: row}), flush=True)
    return out


def step_bench(batch=8192, warmup=4, iters=8, fused=False,
               arch="vgg16_bn_cifar", remat_policy=None, mult=1.0):
    import __graft_entry__ as ge
    from cpg_tpu.data.augment import (cifar_train_augment,
                                      imagenet_train_augment)
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, make_train_step

    augment_fn = (imagenet_train_augment if arch == "resnet50"
                  else cifar_train_augment)
    cfg = TrainConfig(compute_dtype=jnp.bfloat16, use_fused_chain=fused,
                      remat_policy=remat_policy, compiler_options=SCOPED)
    state = ge._build_state(arch=arch, mult=mult, num_classes=5, seed=0)
    task = state.tasks[2]
    model_fn, in_shape = get_model(arch)
    step, (opt_w, opt_pm) = make_train_step(
        model_fn, num_classes=5, mult=mult, has_piggymask=True, cfg=cfg,
        augment_fn=augment_fn)
    pm = task.piggymask
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
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    out = {}
    if what in ("micro", "all"):
        out["micro"] = micro()
    if what in ("step", "all"):
        import cpg_tpu.ops.pallas.fused_chain as fc

        for name, fused, bwd in (("step_default", False, True),
                                 ("step_fused", True, True),
                                 ("step_fused_xla_bwd", True, False)):
            fc.BWD_PALLAS = bwd
            try:
                ms, by = step_bench(fused=fused)
                out[name] = {"ms": round(ms, 2),
                             "ips": round(8192 * 1e3 / ms, 0),
                             "gb": round(by / 1e9, 2) if by else None}
            except Exception as e:
                out[name] = f"failed: {type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({name: out[name]}), flush=True)
        fc.BWD_PALLAS = True
    if what in ("grown", "all"):
        # width-mult 2.0 (1024-channel convs): the fused path now rides the
        # v5e's 128 MiB VMEM instead of falling back (fused_chain._supported
        # cap raised r3); b2048 keeps a single process inside 16 GB HBM
        for name, fused in (("grown2x_default", False), ("grown2x_fused", True)):
            try:
                ms, by = step_bench(batch=2048, warmup=4, iters=8,
                                    fused=fused, mult=2.0)
                out[name] = {"ms": round(ms, 2),
                             "ips": round(2048 * 1e3 / ms, 0),
                             "gb": round(by / 1e9, 2) if by else None}
            except Exception as e:
                out[name] = f"failed: {type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({name: out[name]}), flush=True)
    if what in ("resnet", "all"):
        # ResNet-50 @224: 13 of 16 bottleneck 3x3s are stride-1 fused-chain
        # sites (models/resnet.py); b128 matches the perf_r3e rows
        for name, fused in (("resnet_default", False), ("resnet_fused", True)):
            try:
                ms, by = step_bench(batch=128, warmup=4, iters=8, fused=fused,
                                    arch="resnet50")
                out[name] = {"ms": round(ms, 2),
                             "ips": round(128 * 1e3 / ms, 0),
                             "gb": round(by / 1e9, 2) if by else None}
            except Exception as e:
                out[name] = f"failed: {type(e).__name__}: {str(e)[:300]}"
            print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
