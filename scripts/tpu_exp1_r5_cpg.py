"""Round-5 Exp-1 addendum: re-run the CPG row itself under the accept-mode
compaction fix, so every row of RESULTS_r5_exp1.json ran the SAME code.

The r5 table re-ran PackNet/PAE under the fix (0.846 / 0.854) but injected
CPG from the r3 leg-B cycle (0.915, pre-fix). That injection is defensible
— CPG's two goal-missed tasks hoarded capacity its LATER tasks would have
owned, so the pre-fix number can only understate CPG and the comparison is
conservative against our own method — but apples-to-apples beats defensible:
this runs the identical regime/seeds/goals/forced-growth protocol through
`run_sequence` with the fixed compaction and banks `cpg_fixed`.

All programs are compile-cache hits from the r3 leg-B / r5 rows (same arch,
batch, widths), so this is execution-only chip time (~1.5-2 h).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_exp1_r5_cpg.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_exp1_r5 import (OUT, REGIME, fingerprint_ck, load_out, make_seq,
                         make_tasks, save_out, seq_row)

import jax.numpy as jnp

from cpg_tpu.data import augment as A
from cpg_tpu.train.sequence import run_sequence
from cpg_tpu.train.step import TrainConfig


def main():
    t0 = time.time()
    out = load_out()
    key = "cpg_fixed"
    if key in out:
        print(f"skip {key} (banked)", flush=True)
        return
    goals = json.load(open("baseline_acc_r3_legB.json"))
    tasks = make_tasks()
    forced = list(tasks)[2]
    goals_forced = dict(goals, **{forced: 1.1})
    cfg = TrainConfig(lr=0.02, compute_dtype=jnp.bfloat16)
    ck = os.path.abspath("ck_r5_cpg_fixed")
    over = dict(max_width_mult=2.0, growth_epoch_scale=1.0)
    fingerprint_ck(ck, dict(REGIME, row=key, **over))
    seq = make_seq(checkpoint_dir=ck, **over)
    state, reports = run_sequence(
        "vgg16_bn_cifar", tasks, cfg, seq, goals=goals_forced,
        augment_fn=A.cifar_train_augment,
        preprocess_fn=A.cifar_eval_preprocess)
    out = load_out()  # re-read: don't clobber rows banked meanwhile
    out[key] = seq_row(state, reports, goals, seq)
    save_out(out)
    print(f"[{time.time()-t0:.0f}s] {key}: avg={out[key]['avg_top1']:.3f} "
          f"misses={out[key]['n_goal_misses']} "
          f"mult={out[key]['final_width_mult']}", flush=True)


if __name__ == "__main__":
    main()
