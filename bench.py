"""Benchmark: masked VGG16-BN train-step throughput on one TPU chip.

The headline metric from BASELINE.json: images/sec/chip on the masked VGG16
train step (the reference publishes accuracy only — no throughput numbers
exist, see BASELINE.md). The step benched here is the FULL CPG hot loop in
its most expensive configuration: task 2 over a 50%-compacted task 1 —
on-device augmentation + piggymask binarize + masked conv forward/backward +
ownership gradient gating + selective weight decay + SGD/Adam updates.

vs_baseline: the reference has no number to beat; REF_GPU_IPS_ESTIMATE below
is a documented ESTIMATE of the reference's eager-PyTorch pipeline on a
V100-class GPU (VGG16-BN on 32x32 inputs, batch 128, plus CPG's three extra
eager elementwise passes over all params per step). Treat the ratio as
indicative until the reference is runnable somewhere.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time

# persistent compile cache: remote compiles on this environment cost minutes
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

REF_GPU_IPS_ESTIMATE = 1500.0  # images/sec, eager torch masked VGG16 (estimate)

BATCH = 1024
WARMUP = 10
ITERS = 30


def main():
    from cpg_tpu.data.augment import cifar_train_augment
    from cpg_tpu.models import get_model
    from cpg_tpu.train.step import TrainConfig, make_train_step
    import __graft_entry__ as ge

    state = ge._build_state()
    task = state.tasks[2]
    cfg = TrainConfig(compute_dtype=jnp.bfloat16)
    step, (opt_w, opt_pm) = make_train_step(
        get_model(state.arch)[0], num_classes=5, mult=state.width_mult,
        has_piggymask=True, cfg=cfg, augment_fn=cifar_train_augment,
    )
    opt_w_state = opt_w.init({"shared": state.shared, "private": task.private})
    opt_pm_state = opt_pm.init(task.piggymask)

    rng = jax.random.PRNGKey(0)
    x = jax.random.randint(rng, (BATCH, 32, 32, 3), 0, 256, jnp.int32).astype(jnp.uint8)
    y = jax.random.randint(rng, (BATCH,), 0, 5, jnp.int32)
    x, y = jax.device_put(x), jax.device_put(y)

    shared, pm, private, bn = state.shared, task.piggymask, task.private, task.bn_state
    own = state.ownership

    def run(n):
        # NOTE: host readback of the last step's loss (which chains through
        # every previous step via the donated weights) is the completion
        # barrier — on this environment's relayed-TPU backend,
        # block_until_ready returns before remote execution finishes and
        # produces fantasy numbers (measured 227x over hardware peak).
        nonlocal shared, pm, private, bn, opt_w_state, opt_pm_state, rng
        for _ in range(n):
            rng, sub = jax.random.split(rng)
            (shared, pm, private, bn, opt_w_state, opt_pm_state, m) = step(
                shared, pm, private, bn, opt_w_state, opt_pm_state, own, 2,
                x, y, sub)
        return float(m["loss"])

    run(WARMUP)
    t0 = time.perf_counter()
    last_loss = run(ITERS)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "images_per_sec_per_chip_masked_vgg16_train",
        "value": round(ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / REF_GPU_IPS_ESTIMATE, 3),
        "detail": {
            "batch": BATCH, "iters": ITERS, "step_ms": round(1e3 * dt / ITERS, 3),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
            "compute_dtype": "bfloat16",
            "baseline_note": "vs ESTIMATED eager-torch V100 masked VGG16 "
                             "(reference publishes no throughput)",
        },
    }))


if __name__ == "__main__":
    main()
