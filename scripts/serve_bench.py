"""Transformer serving row (VERDICT r4 weak #6): TaskServer throughput for
a ViT family member, bf16 vs int8 (calibrated), device-resident inputs.

Methodology matches the r2 VGG serving rows (RESULTS.md "int8 post-training-
quantized serving"): the DEVICE-RESIDENT number is what a co-located host
sees — end-to-end numbers through this environment's relay tunnel measure
the ~25MB/s H2D link, not the TPU (CLAUDE.md). Timing dispatches `iters`
sequential calls of the server's own compiled request-path fn and forces a
host scalar readback that data-depends on the LAST call (device execution
is in-order, so it bounds the chain; block_until_ready returns early on
this relay and is never trusted).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/serve_bench.py \
           [--arch vit_cifar] [--batch 4096] [--iters 30]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bench import _probe_backend
import __graft_entry__ as ge
from cpg_tpu.data.augment import cifar_eval_preprocess
from cpg_tpu.serve import TaskServer


def time_device_resident(srv, tid, x_dev, iters):
    task = srv.state.tasks[tid]
    eff, scales = srv._get_eff(tid)
    fn = srv._fns[tid]
    act = srv._act_scales.get(tid)
    y = fn(eff, scales, act, task.private, task.bn_state, x_dev)
    float(jnp.sum(y))  # compile + warm, full completion barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(eff, scales, act, task.private, task.bn_state, x_dev)
    out = float(jnp.sum(y))  # in-order device queue: bounds every call
    dt = (time.perf_counter() - t0) / iters
    assert np.isfinite(out)
    return dt, np.asarray(y)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arch", default="vit_cifar")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    if not _probe_backend():
        sys.exit(2)

    state = ge._build_state(arch=args.arch, mult=1.0, num_classes=10, seed=0)
    rng = np.random.RandomState(0)
    x = rng.randint(0, 256, (args.batch, 32, 32, 3)).astype(np.uint8)
    x_dev = jnp.asarray(x)
    out = {"metric": f"images_per_sec_per_chip_{args.arch}_serving",
           "unit": "images/sec/chip", "device": str(jax.devices()[0]),
           "batch": args.batch, "detail": {}}

    srv_bf16 = TaskServer(state, preprocess_fn=cifar_eval_preprocess,
                          max_bucket=args.batch)
    dt, y_bf16 = time_device_resident(srv_bf16, 2, x_dev, args.iters)
    out["detail"]["bf16"] = {"ms": round(dt * 1e3, 3),
                             "ips": round(args.batch / dt, 1)}

    srv_int8 = TaskServer(state, preprocess_fn=cifar_eval_preprocess,
                          quantize="int8", max_bucket=args.batch)
    srv_int8.calibrate({2: x[:256]})
    dt8, y_int8 = time_device_resident(srv_int8, 2, x_dev, args.iters)
    agree = float((np.argmax(y_bf16, -1) == np.argmax(y_int8, -1)).mean())
    out["detail"]["int8_calibrated"] = {
        "ms": round(dt8 * 1e3, 3), "ips": round(args.batch / dt8, 1),
        "top1_agreement_vs_bf16": round(agree, 4)}

    out["value"] = max(out["detail"]["bf16"]["ips"],
                       out["detail"]["int8_calibrated"]["ips"])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
