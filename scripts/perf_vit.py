"""Masked ViT train-step throughput + two-sided roofline (real chip).

Same methodology as bench.py's VGG headline (task-2-over-compacted-task-1
masked step, device-resident inputs, in-graph augmentation, host-scalar
completion barrier, compiled-program cost_analysis floors) applied to the
transformer family (models/vit.py). One JSON line.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_vit.py
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

from bench import PEAK_BF16_TFLOPS, PEAK_HBM_GBPS, _probe_backend


def time_step(batch, arch="vit_cifar", optimizer="sgd", iters=30, warmup=5):
    from cpg_tpu.core.pruner import one_shot_prune
    from cpg_tpu.data.augment import cifar_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.sequence import init_state, start_task
    from cpg_tpu.train.step import TrainConfig, build_train_step

    cfg = TrainConfig(compute_dtype=jnp.bfloat16, optimizer=optimizer)
    state = init_state(arch, jax.random.PRNGKey(0))
    start_task(state, "t1", 5, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "t2", 5, jax.random.PRNGKey(2))
    task = state.tasks[2]
    model_fn, in_shape = get_model(arch)
    step, (opt_w, opt_pm) = build_train_step(
        model_fn, num_classes=5, mult=1.0, has_piggymask=True, cfg=cfg,
        augment_fn=cifar_train_augment)
    shared, own = state.shared, state.ownership
    pm, priv, bn = task.piggymask, task.private, task.bn_state
    ows = opt_w.init({"shared": shared, "private": priv})
    opms = opt_pm.init(pm)
    jitted = jax.jit(step, donate_argnums=(0, 1, 2, 3, 4, 5))
    x = jnp.zeros((batch, *in_shape), jnp.uint8)
    y = jnp.zeros((batch,), jnp.int32)
    rng = jax.random.PRNGKey(3)
    cost = None
    try:
        ca = jitted.lower(shared, pm, priv, bn, ows, opms, own, 2, x, y,
                          rng, 0).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        cost = {"bytes": float(ca.get("bytes accessed", 0.0)) or None,
                "flops": float(ca.get("flops", 0.0)) or None}
    except Exception:
        pass

    def run(n):
        nonlocal shared, pm, priv, bn, ows, opms, rng
        m = None
        for i in range(n):
            rng, sub = jax.random.split(rng)
            (shared, pm, priv, bn, ows, opms, m) = jitted(
                shared, pm, priv, bn, ows, opms, own, 2, x, y, sub, i)
        return float(m["loss"])  # host readback = completion barrier

    run(warmup)
    t0 = time.perf_counter()
    run(iters)
    ms = 1e3 * (time.perf_counter() - t0) / iters
    return ms, cost


def _roofline(ms, cost):
    if not cost:
        return {}
    gb = cost["bytes"] / 1e9 if cost.get("bytes") else None
    byte_ms = gb / PEAK_HBM_GBPS * 1e3 if gb else 0.0
    flop_ms = (cost["flops"] / (PEAK_BF16_TFLOPS * 1e12) * 1e3
               if cost.get("flops") else 0.0)
    floor = max(byte_ms, flop_ms)
    return {"bytes_per_step_gb": round(gb, 2) if gb else None,
            "hbm_floor_ms": round(byte_ms, 2),
            "tflop_per_step": round(cost["flops"] / 1e12, 2)
            if cost.get("flops") else None,
            "flop_floor_ms": round(flop_ms, 2),
            "bound": "mxu" if flop_ms > byte_ms else "hbm",
            "fraction_of_floor": round(floor / ms, 3) if floor else None}


def _sweep(arch, batches):
    rows, best = {}, None
    for batch in batches:
        try:
            ms, cost = time_step(batch, arch=arch)
        except Exception as e:  # e.g. HBM OOM at the largest batch
            rows[f"b{batch}"] = f"failed: {type(e).__name__}: {str(e)[:160]}"
            continue
        ips = batch * 1e3 / ms
        rows[f"b{batch}"] = {"ms": round(ms, 3), "ips": round(ips, 1)}
        if best is None or ips > best[2]:
            best = (batch, ms, ips, cost)
    if best is None:
        return {"value": None, "by_batch": rows}
    batch, ms, ips, cost = best
    return {"value": round(ips, 1), "batch": batch, "step_ms": round(ms, 3),
            "by_batch": rows, "roofline": _roofline(ms, cost)}


def main():
    if not _probe_backend():
        sys.exit(2)
    dev = str(jax.devices()[0])
    small = _sweep("vit_cifar", (1024, 4096, 8192))
    big = _sweep("vit_b16", (64, 128, 256))  # b256 may OOM 16GB: tolerated
    print(json.dumps({
        "metric": "images_per_sec_per_chip_masked_vit_train",
        "value": small["value"], "unit": "images/sec/chip",
        "detail": {"vit_cifar (dim256 depth6 heads4 p4)": small,
                   "vit_b16 (dim768 depth12 heads12 p16 @224)": big,
                   "device": dev}}))


if __name__ == "__main__":
    main()
