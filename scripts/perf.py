"""THE perf harness: one timing + roofline code path for every family.

Round 3 accumulated nine one-off perf scripts, each hand-rolling metering
and a slightly different roofline — which is exactly how PERF_vit_r3/
PERF_moe_r3 shipped fractions-of-floor above 1.0 (VERDICT r3 weak #1/#7).
This harness replaces them: it reuses bench.py's metering (`_time_step` —
device-resident inputs, in-graph augmentation, host-scalar completion
barrier against the relay's early-return trap, compiled cost_analysis)
and cpg_tpu/utils/roofline.py (spec + measured ceilings, fractions clamped
<= 1.0, byte-model overcount flagged). New experiments are CONFIG, not
copies.

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf.py --exp vit
  python scripts/perf.py --exp vit --arch vit_b16 --batches 64 128 \
      --remat-policy convs --vmem-kib 65536      # lever sweep
  python scripts/perf.py --exp moe
  python scripts/perf.py --exp vgg --batches 1024 8192

One JSON object to stdout; redirect to PERF_<exp>_r<N>.json to bank.
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bench import _probe_backend, _time_step
from cpg_tpu.utils.roofline import load_measured, roofline

# experiment -> (default archs, default batches per arch, augment family)
EXPS = {
    "vgg": (("vgg16_bn_cifar",), {"vgg16_bn_cifar": (1024, 4096, 8192)},
            "cifar"),
    "vit": (("vit_cifar", "vit_b16"),
            {"vit_cifar": (1024, 4096, 8192), "vit_b16": (64, 128, 256)},
            "cifar"),
    "moe": (("vit_moe_cifar", "vit_cifar"),
            {"vit_moe_cifar": (1024, 4096), "vit_cifar": (1024, 4096)},
            "cifar"),
    "sphere": (("spherenet20",), {"spherenet20": (256, 1024)}, "face"),
    # the reference's Exp-2 workhorse (fine-grained @224); first roofline-
    # accountable row r5 (VERDICT r4 weak #5)
    "resnet": (("resnet50",), {"resnet50": (32, 64, 128)}, "imagenet"),
    # second-modality family (models/text.py): token ids need no augment
    "text": (("textcls",), {"textcls": (4096, 16384)}, "none"),
}


def _augment(family):
    from cpg_tpu.data.augment import (cifar_train_augment,
                                      face_train_augment,
                                      imagenet_train_augment)
    return {"cifar": cifar_train_augment, "face": face_train_augment,
            "imagenet": imagenet_train_augment, "none": None}[family]


def sweep(arch, batches, cfg, augment_fn, measured, iters, warmup):
    rows, best = {}, None
    for batch in batches:
        try:
            ms, cost = _time_step(arch, cfg, batch, warmup, iters,
                                  augment_fn=augment_fn)
        except Exception as e:  # e.g. HBM OOM / remote-compile failure
            rows[f"b{batch}"] = (f"failed: {type(e).__name__}: "
                                 f"{str(e)[:200]}")
            continue
        ips = batch * 1e3 / ms
        rows[f"b{batch}"] = {"ms": round(ms, 3), "ips": round(ips, 1)}
        if best is None or ips > best[2]:
            best = (batch, ms, ips, cost)
    if best is None:
        return {"value": None, "by_batch": rows}
    batch, ms, ips, cost = best
    return {"value": round(ips, 1), "batch": batch, "step_ms": round(ms, 3),
            "by_batch": rows,
            "roofline": roofline(ms, cost, measured=measured)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", required=True, choices=sorted(EXPS))
    p.add_argument("--arch", help="restrict the experiment to one arch")
    p.add_argument("--batches", type=int, nargs="+",
                   help="override the arch's default batch sweep")
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--optimizer", default="sgd", choices=["sgd", "adam"])
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--remat", action="store_true",
                   help="full forward remat (compile-memory lever)")
    p.add_argument("--remat-policy", choices=["convs"],
                   help="selective remat (save conv outputs only)")
    p.add_argument("--vmem-kib", type=int,
                   help="xla_tpu_scoped_vmem_limit_kib compiler option")
    p.add_argument("--scan-blocks", action="store_true",
                   help="lax.scan the transformer block stack (ViT): HLO "
                        "shrinks ~depth x — the remote-compile-failure fix")
    p.add_argument("--flash-attention", action="store_true",
                   help="transformer attention via the Pallas flash kernel "
                        "(ops/flash.py): scores never touch HBM, fwd+bwd")
    p.add_argument("--flash-block", type=int,
                   help="override every flash kernel tile to this sequence "
                        "block size (default: upstream 128s)")
    p.add_argument("--qkv-fused", choices=["auto", "on", "off"],
                   default="auto",
                   help="ViT fused (D, 3*inner) QKV GEMM: auto = measured "
                        "default (off since r5 — see models/vit.py)")
    p.add_argument("--unfuse-gating", action="store_true",
                   help="optimization_barrier between grads and the "
                        "ownership-gating selects (keeps them out of conv "
                        "wgrad fusions — see TrainConfig.unfuse_gating)")
    p.add_argument("--unfuse-bn-bwd", action="store_true",
                   help="backward barrier on sconv inputs: keeps BN-bwd "
                        "reduce epilogues out of conv dgrad fusions "
                        "(TrainConfig.unfuse_bn_bwd)")
    p.add_argument("--xla-flag", action="append", default=[],
                   help="extra compiler option KEY=VALUE (repeatable), "
                        "merged over --vmem-kib")
    p.add_argument("--use-pallas", action="store_true")
    p.add_argument("--use-pallas-conv", action="store_true")
    args = p.parse_args()

    if not _probe_backend():
        sys.exit(2)

    from cpg_tpu.train.step import TrainConfig
    if args.flash_block:
        from cpg_tpu.ops.flash import set_block
        set_block(args.flash_block)
    copts = ({"xla_tpu_scoped_vmem_limit_kib": str(args.vmem_kib)}
             if args.vmem_kib else {})
    for kv in args.xla_flag:
        k, _, v = kv.partition("=")
        copts[k] = v
    copts = copts or None
    cfg = TrainConfig(
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16"
        else jnp.float32,
        optimizer=args.optimizer, remat=args.remat,
        remat_policy=args.remat_policy, use_pallas=args.use_pallas,
        use_pallas_conv=args.use_pallas_conv, scan_blocks=args.scan_blocks,
        flash_attention=args.flash_attention,
        qkv_fused={"auto": None, "on": True, "off": False}[args.qkv_fused],
        unfuse_gating=args.unfuse_gating,
        unfuse_bn_bwd=args.unfuse_bn_bwd,
        compiler_options=copts)

    archs, batch_map, aug_family = EXPS[args.exp]
    if args.arch:
        archs = (args.arch,)
    measured = load_measured()
    detail = {"device": str(jax.devices()[0]),
              "levers": {k: v for k, v in (
                  ("optimizer", args.optimizer), ("dtype", args.dtype),
                  ("remat", args.remat), ("remat_policy", args.remat_policy),
                  ("vmem_kib", args.vmem_kib),
                  ("scan_blocks", args.scan_blocks),
                  ("flash_attention", args.flash_attention),
                  ("flash_block", args.flash_block),
                  ("qkv_fused", None if args.qkv_fused == "auto"
                   else args.qkv_fused),
                  ("unfuse_gating", args.unfuse_gating),
                  ("unfuse_bn_bwd", args.unfuse_bn_bwd),
                  ("xla_flags", args.xla_flag or None),
                  ("use_pallas", args.use_pallas),
                  ("use_pallas_conv", args.use_pallas_conv))
                  if v}}
    value = None
    for arch in archs:
        batches = tuple(args.batches or batch_map.get(arch, (1024,)))
        detail[arch] = sweep(arch, batches, cfg, _augment(aug_family),
                             measured, args.iters, args.warmup)
        if value is None:
            value = detail[arch]["value"]
    if (args.exp == "moe" and detail.get("vit_moe_cifar", {}).get("value")
            and detail.get("vit_cifar", {}).get("value")):
        detail["moe_over_dense"] = round(
            detail["vit_moe_cifar"]["value"] / detail["vit_cifar"]["value"],
            3)
    print(json.dumps({
        "metric": f"images_per_sec_per_chip_masked_{args.exp}_train",
        "value": value, "unit": "images/sec/chip", "detail": detail}))


if __name__ == "__main__":
    main()
