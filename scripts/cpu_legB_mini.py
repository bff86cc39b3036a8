"""CPU-scale insurance for leg B (VERDICT r2 #7, width-aware budgets).

A reduced (4-task) version of scripts/tpu_cycle_r3.py leg B that runs on the
CPU backend, for rounds where the TPU relay is down: same non-saturating
calibration (noise 2.5, 150/class, b128 — hardware-probed regime where epoch
budgets bind), growth forced on task 2, growth_epoch_scale 0.0 vs 1.0
compared on post-growth task accuracy. Supersded by RESULTS_r3_cycle.json
whenever the full 20-task hardware leg lands.

Usage: PYTHONPATH='' JAX_PLATFORMS=cpu python scripts/cpu_legB_mini.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cpg_tpu.data import augment as A
from cpg_tpu.data.cifar import task_splits
from cpg_tpu.train.baselines import train_individual_baselines
from cpg_tpu.train.sequence import SequenceConfig, run_sequence
from cpg_tpu.train.step import TrainConfig


def main():
    t0 = time.time()
    # --small: sized for a SINGLE CPU core in ~3h (3 tasks, one growth step
    # to 1.5, fewer ratios/prune epochs); the DATA/finetune budget stays at
    # the calibrated regime (150/class, 6 epochs, b128 — measured 2026-08-17
    # on chip: the steep part of the curve; 100/class @4 epochs was CHANCE)
    small = "--small" in sys.argv
    n_tasks, fe, pe, re = (3, 6, 2, 2) if small else (4, 6, 3, 3)
    ratios = (0.3, 0.6) if small else (0.2, 0.4, 0.6)
    tasks = task_splits(synthetic_kwargs={
        "n_train_per_class": 150, "n_test_per_class": 60, "noise": 2.5})
    tasks = dict(list(tasks.items())[:n_tasks])
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.float32)
    goals = train_individual_baselines(
        "vgg16_bn_cifar", tasks, cfg, epochs=fe, batch_size=128,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    print(f"[{time.time()-t0:.0f}s] baselines "
          f"avg={sum(goals.values())/len(goals):.3f}", flush=True)
    forced = list(tasks)[1]
    goals_forced = dict(goals, **{forced: 1.1})
    out = {"backend": jax.default_backend(), "goals": goals, "small": small,
           "n_tasks": len(tasks), "forced": forced}
    for scale in (0.0, 1.0):
        seq = SequenceConfig(
            finetune_epochs=fe, prune_epochs=pe, retrain_epochs=re,
            prune_ratios=ratios, batch_size=128, lr=0.02,
            on_goal_miss="accept", verify_growth=True,
            max_width_mult=1.5 if small else 2.0,
            growth_epoch_scale=scale)
        state, reports = run_sequence(
            "vgg16_bn_cifar", tasks, cfg, seq, goals=goals_forced,
            augment_fn=A.cifar_train_augment,
            preprocess_fn=A.cifar_eval_preprocess)
        grown = [r for r in reports if r.width_mult > 1.0 and r.name != forced]
        out[f"scale_{scale:g}"] = {
            "avg_top1": sum(r.final_acc for r in reports) / len(reports),
            "post_growth_avg": (sum(r.final_acc for r in grown)
                                / max(len(grown), 1)),
            "final_width_mult": state.width_mult,
            "tasks": [{"name": r.name, "top1": r.final_acc,
                       "mult": r.width_mult} for r in reports],
        }
        print(f"[{time.time()-t0:.0f}s] scale={scale}: "
              f"{json.dumps(out[f'scale_{scale:g}'])}", flush=True)
    out["seconds_total"] = round(time.time() - t0, 1)
    with open("RESULTS_r3_legB_cpu_mini.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "goals"}),
          flush=True)


if __name__ == "__main__":
    main()
