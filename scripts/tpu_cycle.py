"""Round-2 TPU validation cycle (VERDICT items 5 & 9).

Runs, on the real chip, at a scale where every synthetic task saturates
(so CPG-vs-PackNet rows measure the method, not task-1 underfit):

  1. individual baselines (20 tasks)  -> goals file
  2. the full CPG 20-task sequence with a deliberately impossible goal on
     one mid-sequence task, forcing the width multiplier 1.0 -> 1.5 -> 2.0;
     every growth event is audited in-process (SequenceConfig.verify_growth:
     old-task logits on a probe batch must survive the embed)
  3. task-conditioned re-eval of EVERY task from the final state (the
     no-forgetting ledger)
  4. the PackNet comparison row on the identical data/config

Writes RESULTS_r2_cycle.json at the repo root.

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_cycle.py
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

from cpg_tpu.data import augment as A
from cpg_tpu.data.cifar import task_splits
from cpg_tpu.train.baselines import (run_packnet_sequence,
                                     train_individual_baselines)
from cpg_tpu.train.sequence import SequenceConfig, run_sequence
from cpg_tpu.train.step import TrainConfig

# saturating synthetic scale (VERDICT item 9: every baseline >= 0.9)
PER_CLASS_TRAIN = 400
PER_CLASS_TEST = 80
BATCH = 256
FINETUNE_EPOCHS = 10
PRUNE_EPOCHS = 4
RETRAIN_EPOCHS = 4
FORCED_GROWTH_TASK_INDEX = 4  # 5th task gets an impossible goal -> grow


def main():
    t0 = time.time()
    tasks = task_splits(synthetic_kwargs={
        "n_train_per_class": PER_CLASS_TRAIN,
        "n_test_per_class": PER_CLASS_TEST})
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    out = {"config": {"per_class_train": PER_CLASS_TRAIN, "batch": BATCH,
                      "finetune_epochs": FINETUNE_EPOCHS,
                      "device": str(jax.devices()[0])}}

    # 1. individual baselines = the goals CPG must meet
    goals = train_individual_baselines(
        "vgg16_bn_cifar", tasks, cfg, epochs=FINETUNE_EPOCHS, batch_size=BATCH,
        augment_fn=A.cifar_train_augment, preprocess_fn=A.cifar_eval_preprocess,
        acc_file="baseline_acc_r2.json")
    out["baseline"] = {"accs": goals,
                       "min": min(goals.values()),
                       "avg": sum(goals.values()) / len(goals)}
    print(f"[{time.time()-t0:.0f}s] baselines done: "
          f"min={out['baseline']['min']:.3f} avg={out['baseline']['avg']:.3f}",
          flush=True)

    # 2. CPG sequence with one impossible goal -> forced growth + audits
    forced = list(tasks)[FORCED_GROWTH_TASK_INDEX]
    goals_forced = dict(goals)
    goals_forced[forced] = 1.1  # > 1.0 = unreachable BY CONSTRUCTION: the
    # task walks the full growth ladder 1.0 -> 1.5 -> 2.0 (auditing each
    # embed) and then accepts at max_width_mult (on_goal_miss='accept').
    # (0.9999 is NOT unreachable here — saturated synthetic tasks hit 1.0.)
    seq = SequenceConfig(
        finetune_epochs=FINETUNE_EPOCHS, prune_epochs=PRUNE_EPOCHS,
        retrain_epochs=RETRAIN_EPOCHS, prune_ratios=(0.2, 0.4, 0.6, 0.8),
        batch_size=BATCH, lr=0.02, on_goal_miss="accept",
        verify_growth=True,
        # crash recovery: per-task + post-pick (phase-granular) checkpoints
        checkpoint_dir=os.path.abspath("ck_r2_cycle"))
    state, reports = run_sequence(
        "vgg16_bn_cifar", tasks, cfg, seq, goals=goals_forced,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    out["cpg"] = {
        "avg_top1": sum(r.final_acc for r in reports) / len(reports),
        "final_width_mult": state.width_mult,
        "growth_events": sum(r.grew for r in reports),
        "tasks": [{"name": r.name, "top1": r.final_acc,
                   "ratio": r.chosen_ratio, "mult": r.width_mult,
                   "grew": r.grew} for r in reports],
    }
    print(f"[{time.time()-t0:.0f}s] CPG done: avg={out['cpg']['avg_top1']:.3f}"
          f" mult={state.width_mult} grew={out['cpg']['growth_events']}",
          flush=True)
    assert out["cpg"]["growth_events"] >= 2, "growth was not forced!"

    # 3. the no-forgetting ledger: re-eval EVERY task from the final state
    from cpg_tpu.train.manager import Manager
    from cpg_tpu.models import get_model
    ledger = {}
    model_fn = get_model("vgg16_bn_cifar")[0]
    for tid, (name, data) in enumerate(tasks.items(), 1):
        mgr = Manager(state, model_fn, tid, data, cfg, batch_size=BATCH,
                      preprocess_fn=A.cifar_eval_preprocess)
        ledger[name] = mgr.eval(tid)
    out["final_ledger"] = ledger
    out["ledger_matches_reports"] = all(
        abs(ledger[r.name] - r.final_acc) < 0.02 for r in reports)
    print(f"[{time.time()-t0:.0f}s] ledger avg="
          f"{sum(ledger.values())/len(ledger):.3f} "
          f"matches={out['ledger_matches_reports']}", flush=True)

    # 4. PackNet comparison row, identical config
    pstate, preports = run_packnet_sequence(
        "vgg16_bn_cifar", tasks, cfg, seq, goals=goals,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    out["packnet"] = {
        "avg_top1": sum(r.final_acc for r in preports) / len(preports),
        "final_width_mult": pstate.width_mult,
    }
    out["seconds_total"] = round(time.time() - t0, 1)
    with open("RESULTS_r2_cycle.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("baseline", "cpg", "packnet", "seconds_total")
                      if k in out}, default=str)[:2000], flush=True)


if __name__ == "__main__":
    main()
