"""Masked MoE-ViT train-step throughput + roofline (real chip).

Same methodology as perf_vit.py (device-resident inputs, in-graph
augmentation, host-scalar completion barrier, compiled cost_analysis
floors) on the MoE family (models/moe.py, arch vit_moe_cifar): quantifies
what the static one-hot dispatch costs on top of the dense ViT step at the
same depth/dim. One JSON line.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_moe.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

from bench import _probe_backend
from perf_vit import _sweep


def main():
    if not _probe_backend():
        sys.exit(2)
    dev = str(jax.devices()[0])
    moe = _sweep("vit_moe_cifar", (1024, 4096))
    dense = _sweep("vit_cifar", (1024, 4096))  # cache-warm comparator
    out = {
        "metric": "images_per_sec_per_chip_masked_moe_vit_train",
        "value": moe["value"], "unit": "images/sec/chip",
        "detail": {"vit_moe_cifar (dim256 depth6 heads4 4 experts)": moe,
                   "vit_cifar same-shape dense comparator": dense,
                   "device": dev}}
    if moe.get("value") and dense.get("value"):
        out["detail"]["moe_over_dense"] = round(
            moe["value"] / dense["value"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
