"""Round-3 TPU validation cycle (VERDICT r2 #6 and #7 'Done' criteria).

Legs (real chip, one process — never share the TPU):

  A. PackNet de-waste at growth scale (VERDICT #6): the 20-task PackNet row
     with a forced-growth goal, saturated data — identical config to the r2
     row (RESULTS_r2_cycle.json packnet avg 1.000 @ mult 2.0) but now with
     mask_mode='packnet': NO piggymask tensors exist. Records the accuracy
     (must match r2) and the bytes the masks would have cost.

  B. Width-aware budgets (VERDICT #7): a NON-saturating config (the r2 cycle
     saturated at 1.0 everywhere, so under-fit was invisible) with forced
     growth on an early task, run twice — growth_epoch_scale 0.0 (fixed,
     reference-faithful) vs 1.0 (epochs linear in width). Compares
     post-growth task accuracies and goal hits. Leg B also runs with
     epoch_checkpoint_freq=3 to exercise intra-pick checkpoints in
     production.

Writes RESULTS_r3_cycle.json at the repo root.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_cycle_r3.py
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cpg_tpu.data import augment as A
from cpg_tpu.data.cifar import task_splits
from cpg_tpu.train.baselines import (run_packnet_sequence,
                                     train_individual_baselines)
from cpg_tpu.train.sequence import SequenceConfig, run_sequence
from cpg_tpu.train.step import TrainConfig

BATCH = 256


def leg_a_packnet(out, t0):
    tasks = task_splits(synthetic_kwargs={
        "n_train_per_class": 400, "n_test_per_class": 80})
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    goals = json.load(open("baseline_acc_r2.json"))  # r2's saturated goals
    forced = list(tasks)[4]
    goals = dict(goals, **{forced: 1.1})  # walk the growth ladder to 2.0
    seq = SequenceConfig(
        finetune_epochs=10, prune_epochs=4, retrain_epochs=4,
        prune_ratios=(0.2, 0.4, 0.6, 0.8), batch_size=BATCH, lr=0.02,
        on_goal_miss="accept", verify_growth=True)
    state, reports = run_packnet_sequence(
        "vgg16_bn_cifar", tasks, cfg, seq, goals=goals,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    masks = [t.piggymask for t in state.tasks.values()]
    shared_bytes = sum(int(np.prod(v.shape)) * 4 for v in state.shared.values())
    out["packnet_r3"] = {
        "avg_top1": sum(r.final_acc for r in reports) / len(reports),
        "final_width_mult": state.width_mult,
        "mask_tensors": sum(m is not None for m in masks),
        "mask_bytes_avoided": shared_bytes * (len(masks) - 1),
        "r2_row": {"avg_top1": 1.0, "final_width_mult": 2.0},
    }
    assert out["packnet_r3"]["mask_tensors"] == 0, "packnet carried masks!"
    print(f"[{time.time()-t0:.0f}s] leg A done: "
          f"{json.dumps(out['packnet_r3'])}", flush=True)


def leg_b_budgets(out, t0):
    # NON-saturating: growth forced on task 3 so most of the sequence trains
    # at a grown width where under-fit shows. Calibrated on hardware
    # (2026-08-17 probes): noise=0.9 is a step function (12 steps -> chance,
    # 30 steps -> 1.0), useless for a budget study; noise=2.5 @ b128/150-per-
    # class sits on the steep part (6 epochs -> ~0.66, 18 -> ~0.98), so epoch
    # budgets are the binding constraint — exactly what VERDICT #7 tests.
    tasks = task_splits(synthetic_kwargs={
        "n_train_per_class": 150, "n_test_per_class": 60, "noise": 2.5})
    batch = 128
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    # baselines are deterministic (fixed seeds, synthetic data), so a
    # relay-outage relaunch reuses the saved file instead of re-spending
    # ~25 TPU-minutes — but ONLY when the calibration config that produced
    # them matches (this leg was recalibrated once already; a silent reuse
    # across a config change would run the whole A/B off wrong goals)
    bl_cfg = {"arch": "vgg16_bn_cifar", "noise": 2.5, "n_train": 150,
              "n_test": 60, "epochs": 6, "batch": batch, "lr": 0.02}
    try:
        goals = json.load(open("baseline_acc_r3_legB.json"))
        assert set(goals) == set(tasks)
        assert json.load(open("baseline_acc_r3_legB.meta.json")) == bl_cfg
    except Exception:
        goals = train_individual_baselines(
            "vgg16_bn_cifar", tasks, cfg, epochs=6, batch_size=batch,
            augment_fn=A.cifar_train_augment,
            preprocess_fn=A.cifar_eval_preprocess,
            acc_file="baseline_acc_r3_legB.json")
        json.dump(bl_cfg, open("baseline_acc_r3_legB.meta.json", "w"))
    print(f"[{time.time()-t0:.0f}s] leg B baselines: "
          f"min={min(goals.values()):.3f} "
          f"avg={sum(goals.values())/len(goals):.3f}", flush=True)
    forced = list(tasks)[2]
    goals_forced = dict(goals, **{forced: 1.1})
    rows = {}
    for scale in (0.0, 1.0):
        # run_sequence's resume path matches on task name only, so a stale
        # checkpoint dir from an EARLIER CONFIG would be silently adopted
        # and its old-regime accuracies reported as this run's results.
        # But relay outages force relaunches mid-leg, so same-config
        # checkpoints must survive: fingerprint the leg config into the dir
        # and wipe only on mismatch.
        import shutil
        ck = os.path.abspath(f"ck_r3_legB_s{scale:.0f}")
        fp = {"noise": 2.5, "n_train": 150, "batch": batch, "scale": scale,
              "epochs": [6, 3, 3], "ratios": [0.2, 0.4, 0.6],
              "goals_min": round(min(goals.values()), 4)}
        fp_path = os.path.join(ck, "leg_config.json")
        try:
            have = json.load(open(fp_path))
        except Exception:
            have = None
        if have != fp:
            shutil.rmtree(ck, ignore_errors=True)
            os.makedirs(ck, exist_ok=True)
            json.dump(fp, open(fp_path, "w"))
        seq = SequenceConfig(
            finetune_epochs=6, prune_epochs=3, retrain_epochs=3,
            prune_ratios=(0.2, 0.4, 0.6), batch_size=batch, lr=0.02,
            on_goal_miss="accept", verify_growth=True,
            growth_epoch_scale=scale, epoch_checkpoint_freq=3,
            checkpoint_dir=ck)
        state, reports = run_sequence(
            "vgg16_bn_cifar", tasks, cfg, seq, goals=goals_forced,
            augment_fn=A.cifar_train_augment,
            preprocess_fn=A.cifar_eval_preprocess)
        grown = [r for r in reports if r.width_mult > 1.0
                 and r.name != forced]
        pre = [r for r in reports if r.width_mult == 1.0]
        miss = [r.name for r in reports
                if r.final_acc < goals[r.name] - seq.allow_acc_diff]
        rows[f"scale_{scale:g}"] = {
            "avg_top1": sum(r.final_acc for r in reports) / len(reports),
            "post_growth_avg": (sum(r.final_acc for r in grown)
                                / max(len(grown), 1)),
            "pre_growth_avg": (sum(r.final_acc for r in pre)
                               / max(len(pre), 1)),
            "final_width_mult": state.width_mult,
            "goal_misses": miss,
            "tasks": [{"name": r.name, "top1": r.final_acc,
                       "mult": r.width_mult, "ratio": r.chosen_ratio}
                      for r in reports],
        }
        print(f"[{time.time()-t0:.0f}s] leg B scale={scale}: "
              f"post_growth_avg={rows[f'scale_{scale:g}']['post_growth_avg']:.3f} "
              f"misses={len(miss)}", flush=True)
    out["budgets_r3"] = rows


def main():
    t0 = time.time()
    out = {"device": str(jax.devices()[0])}
    if "--skip-a" in sys.argv:
        # Leg A already ran to completion on hardware; reuse its saved row
        # (RESULTS_r3_legA.json, provenance inside) rather than re-spending
        # ~24 TPU-minutes. Fails loudly if the artifact is missing so a
        # code change can't silently ride a stale claim.
        out["packnet_r3"] = json.load(open("RESULTS_r3_legA.json"))
        print(f"[{time.time()-t0:.0f}s] leg A injected from "
              "RESULTS_r3_legA.json", flush=True)
    else:
        leg_a_packnet(out, t0)
    leg_b_budgets(out, t0)
    out["seconds_total"] = round(time.time() - t0, 1)
    with open("RESULTS_r3_cycle.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "budgets_r3"},
                     default=str)[:1500], flush=True)


if __name__ == "__main__":
    main()
