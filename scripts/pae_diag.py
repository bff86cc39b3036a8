"""PAE-inversion diagnostics (VERDICT r4 weak #2) — CPU repros.

The r4 Exp-1 row had PAE (prune-and-freeze + expansion) 10 points BELOW
fixed-capacity PackNet, and RESULTS.md r4 explained it with a claim that
contradicts `ops/masked.py` (prior weights ARE visible in packnet mode).
This script established the true mechanism (RESULTS.md r5 section "The
PAE inversion re-explained"):

  * ownership starvation: a forced-unattainable goal makes the grower's
    incremental compact walk break at ratio 0.0, hoarding the entire
    free pool — every later task owns ZERO shared entries (fixed in
    train/sequence.py `_compact`: accept-mode walks vs best effort);
  * the PAE < PackNet gap is frozen-trunk quality: the grown half
    starts as exact zeros with zero-init consumers and barely trains
    (top-down unlock), so later probes see a half-dead dictionary;
  * banked negatives: reinit_free=True hurts the grower (noise corrupts
    the preserved trunk function); shallow stacks do NOT reproduce the
    inversion (the head unlocks adjacent grown channels immediately).

Run (CPU, ~10 min): PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
    python scripts/pae_diag.py [--deep]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cpg_tpu.models import REGISTRY
from cpg_tpu.models.framework import batchnorm, head, maxpool, relu, sconv
import tests.helpers as H  # registers tiny_cnn
from cpg_tpu.train.baselines import run_packnet_sequence, run_pae_sequence
from cpg_tpu.train.sequence import SequenceConfig
from cpg_tpu.train.step import TrainConfig


def vgg8_tiny(ctx, x, num_classes, mult=1.0):
    """8-conv VGG-ish stack on 16x16 — deep enough for the zero-bootstrap
    pathology (grown channels unlock top-down through many layers)."""
    chans = [16, 16, 32, 32, 64, 64, 64, 64]
    pools = {1, 3, 7}
    for i, c in enumerate(chans):
        x = sconv(ctx, f"features/conv{i}", x, max(1, int(c * mult)),
                  kernel=3)
        x = batchnorm(ctx, f"features/bn{i}", x)
        x = relu(x)
        if i in pools:
            x = maxpool(x)
    x = x.mean(axis=(1, 2))
    return head(ctx, "classifier", x, num_classes)


REGISTRY.setdefault("vgg8_tiny", (vgg8_tiny, (16, 16, 3)))

N_TASKS = 5


def seqcfg(maxw, scale=0.0, reinit=False):
    return SequenceConfig(finetune_epochs=6, prune_epochs=2,
                          retrain_epochs=2, prune_ratios=(0.2, 0.4, 0.6),
                          batch_size=64, lr=0.05, on_goal_miss="accept",
                          max_width_mult=maxw, growth_epoch_scale=scale,
                          reinit_free=reinit, verify_growth=True, seed=0)


def row(arch, tasks, goals_forced, label, fn, seq):
    cfg = TrainConfig(lr=0.05, compute_dtype=jnp.float32)
    st, reps = fn(arch, tasks, cfg, seq, goals=goals_forced,
                  augment_fn=H.norm_augment, preprocess_fn=H.normalize01)
    own_flat = np.concatenate([np.asarray(v).ravel()
                               for v in st.ownership.values()])
    res = {"avg": round(sum(r.final_acc for r in reps) / N_TASKS, 4),
           "width": st.width_mult,
           "tasks": [{"n": r.name, "acc": round(r.final_acc, 3),
                      "ratio": r.chosen_ratio, "mult": r.width_mult,
                      "owned": int((own_flat == r.task_id).sum())}
                     for r in reps]}
    print(label, json.dumps(res), flush=True)
    return res


def main():
    arch = "vgg8_tiny" if "--deep" in sys.argv else "tiny_cnn"
    tasks = {f"t{i}": H.synthetic_task(i, n_train=192, n_test=96)
             for i in range(N_TASKS)}
    goals_forced = {f"t{i}": 0.35 for i in range(N_TASKS)}
    goals_forced["t1"] = 1.1  # forced growth, unreachable by design
    out = {
        "arch": arch,
        "packnet": row(arch, tasks, goals_forced, "packnet",
                       run_packnet_sequence, seqcfg(1.0)),
        "pae": row(arch, tasks, goals_forced, "pae",
                   run_pae_sequence, seqcfg(2.0, 1.0)),
        "pae_reinit": row(arch, tasks, goals_forced, "pae_reinit",
                          run_pae_sequence, seqcfg(2.0, 1.0, reinit=True)),
    }
    print("SUMMARY", json.dumps({k: v["avg"] for k, v in out.items()
                                 if isinstance(v, dict)}))


if __name__ == "__main__":
    main()
