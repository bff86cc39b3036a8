"""Round-4 Exp-1 trio at the calibrated NON-saturating regime (VERDICT r3 #1).

The reference's headline Exp-1 result is an ORDERING (ref:README.md table,
ref:experiment1/CPG_cifar100.sh protocol): CPG ~ individual models, both
above PackNet/PAE at bounded capacity. Round 2/3 rows all saturated at ~1.0
where orderings are invisible. Round 3 leg B calibrated a regime where epoch
budgets bind (noise=2.5, 150 train/60 test per class, b128: 6 epochs -> ~0.58
avg individual, 18 -> ~0.98) and banked the CPG rows (RESULTS_r3_cycle.json:
growth_epoch_scale 0.0 -> post-growth avg 0.569, 12 goal misses; 1.0 ->
0.919, 2 misses). This script completes the trio AT THE SAME REGIME:

  * individual_12ep  — budget-matched individual models (12 epochs =
                       CPG's finetune 6 + prune 3 + retrain 3), fresh net
                       per task: the "upper bound" row.
  * packnet_fixed    — prune-and-freeze, NO piggymasks, capacity FIXED at
                       width 1.0 (ref:packnet_cifar100_main.py protocol).
  * pae              — prune-and-freeze + width expansion (no picking
                       masks), same growth ladder/budgets as the CPG row.
  * cpg              — injected from RESULTS_r3_cycle.json scale_1 (same
                       goals, same forced-growth task, same seeds).

All four face the SAME goals (baseline_acc_r3_legB.json, 6-epoch
individuals) with the SAME forced-growth task (index 2, goal 1.1) so growth
triggers at the same point in every expandable row. Writes
RESULTS_r4_exp1.json (incrementally, one row per key, so relay outages lose
at most one row).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_exp1_r4.py
"""

import json
import os
import shutil
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
from cpg_tpu.train.baselines import run_packnet_sequence, run_pae_sequence
from cpg_tpu.train.manager import Manager
from cpg_tpu.train.sequence import SequenceConfig, init_state, start_task
from cpg_tpu.train.step import TrainConfig

OUT = "RESULTS_r4_exp1.json"
BATCH = 128
REGIME = {"arch": "vgg16_bn_cifar", "noise": 2.5, "n_train": 150,
          "n_test": 60, "batch": BATCH, "lr": 0.02}


def load_out():
    try:
        return json.load(open(OUT))
    except Exception:
        return {"device": str(jax.devices()[0]), "regime": REGIME}


def save_out(out):
    tmp = OUT + ".tmp"
    json.dump(out, open(tmp, "w"), indent=1)
    os.replace(tmp, OUT)


def make_tasks():
    return task_splits(synthetic_kwargs={
        "n_train_per_class": 150, "n_test_per_class": 60, "noise": 2.5})


def make_seq(**over):
    base = dict(finetune_epochs=6, prune_epochs=3, retrain_epochs=3,
                prune_ratios=(0.2, 0.4, 0.6), batch_size=BATCH, lr=0.02,
                on_goal_miss="accept", verify_growth=True,
                epoch_checkpoint_freq=3)
    base.update(over)
    return SequenceConfig(**base)


def fingerprint_ck(ck, fp):
    fp_path = os.path.join(ck, "leg_config.json")
    try:
        have = json.load(open(fp_path))
    except Exception:
        have = None
    if have != fp:
        shutil.rmtree(ck, ignore_errors=True)
        os.makedirs(ck, exist_ok=True)
        json.dump(fp, open(fp_path, "w"))


def seq_row(state, reports, goals, seq):
    miss = [r.name for r in reports
            if r.final_acc < goals[r.name] - seq.allow_acc_diff]
    return {
        "avg_top1": sum(r.final_acc for r in reports) / len(reports),
        "final_width_mult": state.width_mult,
        "goal_misses": miss,
        "n_goal_misses": len(miss),
        "tasks": [{"name": r.name, "top1": r.final_acc,
                   "mult": r.width_mult, "ratio": r.chosen_ratio}
                  for r in reports],
    }


def row_individual_12ep(out, goals, t0):
    """Budget-matched individuals: 12 epochs (= CPG's 6+3+3 at width 1.0),
    fresh model per task. Incremental per-task saves (each task ~1 min)."""
    key = "individual_12ep"
    row = out.get(key, {"epochs": 12, "tasks": {}})
    tasks = make_tasks()
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    from cpg_tpu.models import get_model
    model_fn, _ = get_model("vgg16_bn_cifar")
    for i, (name, data) in enumerate(tasks.items()):
        if name in row["tasks"]:
            continue
        state = init_state("vgg16_bn_cifar", jax.random.PRNGKey(i))
        start_task(state, name, data["num_classes"],
                   jax.random.PRNGKey(1000 + i))
        mgr = Manager(state, model_fn, 1, data, cfg, batch_size=BATCH,
                      augment_fn=A.cifar_train_augment,
                      preprocess_fn=A.cifar_eval_preprocess, seed=0)
        res = mgr.train(12, base_lr=0.02)
        row["tasks"][name] = res.acc
        row["avg_top1"] = sum(row["tasks"].values()) / len(row["tasks"])
        out[key] = row
        save_out(out)
        print(f"[{time.time()-t0:.0f}s] individual {name}: {res.acc:.3f}",
              flush=True)
    row["avg_top1"] = sum(row["tasks"].values()) / len(row["tasks"])
    out[key] = row
    save_out(out)


def row_packnet_fixed(out, goals, goals_forced, t0):
    key = "packnet_fixed"
    if key in out:
        return
    tasks = make_tasks()
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    ck = os.path.abspath("ck_r4_packnet")
    fingerprint_ck(ck, dict(REGIME, row=key, max_width=1.0,
                            epochs=[6, 3, 3], ratios=[0.2, 0.4, 0.6]))
    seq = make_seq(max_width_mult=1.0, checkpoint_dir=ck)
    state, reports = run_packnet_sequence(
        "vgg16_bn_cifar", tasks, cfg, seq, goals=goals_forced,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    out[key] = seq_row(state, reports, goals, seq)
    save_out(out)
    print(f"[{time.time()-t0:.0f}s] packnet_fixed: "
          f"avg={out[key]['avg_top1']:.3f} misses={out[key]['n_goal_misses']}",
          flush=True)


def row_pae(out, goals, goals_forced, t0):
    key = "pae"
    if key in out:
        return
    tasks = make_tasks()
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    ck = os.path.abspath("ck_r4_pae")
    fingerprint_ck(ck, dict(REGIME, row=key, max_width=2.0, scale=1.0,
                            epochs=[6, 3, 3], ratios=[0.2, 0.4, 0.6]))
    seq = make_seq(max_width_mult=2.0, growth_epoch_scale=1.0,
                   checkpoint_dir=ck)
    state, reports = run_pae_sequence(
        "vgg16_bn_cifar", tasks, cfg, seq, goals=goals_forced,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    out[key] = seq_row(state, reports, goals, seq)
    save_out(out)
    print(f"[{time.time()-t0:.0f}s] pae: avg={out[key]['avg_top1']:.3f} "
          f"mult={out[key]['final_width_mult']} "
          f"misses={out[key]['n_goal_misses']}", flush=True)


def main():
    t0 = time.time()
    out = load_out()
    goals = json.load(open("baseline_acc_r3_legB.json"))
    # Same forced-growth task as the r3 CPG legs (index 2 = flowers).
    tasks = make_tasks()
    forced = list(tasks)[2]
    goals_forced = dict(goals, **{forced: 1.1})
    out["goals_6ep_individual"] = {
        "avg_top1": sum(goals.values()) / len(goals),
        "source": "baseline_acc_r3_legB.json"}
    # Inject the banked CPG row (same goals/forced task/seeds, scale 1.0).
    cyc = json.load(open("RESULTS_r3_cycle.json"))
    out["cpg"] = dict(cyc["budgets_r3"]["scale_1"],
                      source="RESULTS_r3_cycle.json budgets_r3.scale_1")
    out["cpg"]["n_goal_misses"] = len(out["cpg"]["goal_misses"])
    save_out(out)

    row_packnet_fixed(out, goals, goals_forced, t0)
    row_pae(out, goals, goals_forced, t0)
    row_individual_12ep(out, goals, t0)

    out["ordering"] = {
        k: round(out[k]["avg_top1"], 4)
        for k in ("individual_12ep", "cpg", "pae", "packnet_fixed")
        if k in out}
    out["seconds_total"] = round(time.time() - t0, 1)
    save_out(out)
    print(json.dumps(out["ordering"]), flush=True)


if __name__ == "__main__":
    main()
