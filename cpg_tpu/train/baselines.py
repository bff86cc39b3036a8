"""Baselines: individual per-task models, PackNet, and PAE.

Reference parity (SURVEY §2, paper Exp-1 comparison rows):
  * Individual-model baseline (ref:experiment1/baseline_cifar100.sh + its main
    script): trains one fresh model per task; the resulting accuracies become
    the per-task goals CPG must meet (ref `--baseline_acc_file`).
  * PackNet (ref:packnet_cifar100_main.py, ref:packnet_models/): prune-and-
    freeze continual learning WITHOUT piggyback masks — new tasks reuse all
    prior weights unmasked (frozen) plus the released capacity, at FIXED
    network capacity. In this stack that is literally the CPG cycle with the
    piggymask pinned at its above-threshold init and never trained
    (cfg.train_piggymask=False).
  * PAE ("pack and expand", the authors' pre-CPG method the paper compares
    against alongside PackNet): PackNet's prune-and-freeze PLUS width
    expansion when the current capacity can't reach a task's goal — CPG
    minus the picking masks.
"""

from __future__ import annotations

import dataclasses
import json
import logging
import os
from typing import Dict, Optional

import jax

from .manager import Manager
from .sequence import SequenceConfig, init_state, run_sequence, start_task
from .step import TrainConfig

log = logging.getLogger("cpg_tpu")


def train_individual_baselines(
    arch: str,
    tasks: Dict[str, Dict],
    cfg: Optional[TrainConfig] = None,
    epochs: int = 30,
    batch_size: int = 128,
    lr: Optional[float] = None,
    augment_fn=None,
    preprocess_fn=None,
    seed: int = 0,
    acc_file: Optional[str] = None,
) -> Dict[str, float]:
    """One fresh model per task -> {task: top1}; optionally writes the
    baseline-acc file (the reference's logs/baseline_*_acc*.txt equivalent,
    as JSON)."""
    cfg = cfg or TrainConfig()
    goals = {}
    from ..models import get_model

    model_fn, _ = get_model(arch)
    for i, (name, data) in enumerate(tasks.items()):
        state = init_state(arch, jax.random.PRNGKey(seed + i))
        start_task(state, name, data["num_classes"],
                   jax.random.PRNGKey(seed + 1000 + i),
                   model_kwargs=data.get("model_kwargs"))
        mgr = Manager(state, model_fn, 1, data, cfg, batch_size=batch_size,
                      augment_fn=augment_fn, preprocess_fn=preprocess_fn,
                      seed=seed, loss_fn=data.get("loss_fn"))
        res = mgr.train(epochs, base_lr=lr)
        goals[name] = res.acc
        log.info("baseline %s: acc=%.4f", name, res.acc)
    if acc_file:
        os.makedirs(os.path.dirname(acc_file) or ".", exist_ok=True)
        with open(acc_file, "w") as f:
            json.dump(goals, f, indent=1)
    return goals


def run_packnet_sequence(arch, tasks, cfg: Optional[TrainConfig] = None,
                         seq: Optional[SequenceConfig] = None, **kwargs):
    """PackNet comparison row: prune-and-freeze with NO piggyback masks.

    `mask_mode='packnet'` makes every prior task's surviving weight visible
    unmasked (ops/masked.effective_kernel) and start_task materializes no
    mask tensors — matching ref:packnet_cifar100_main.py, which has no
    piggymasks at all, and avoiding O(num_tasks) full-weight-shape mask +
    Adam tensors of pure overhead (the forward math is identical to the old
    frozen-at-init masks, which binarized to all-ones)."""
    cfg = cfg or TrainConfig()
    cfg = dataclasses.replace(cfg, train_piggymask=False)
    seq = seq or SequenceConfig()
    state = kwargs.pop("state", None)
    mkw = kwargs.pop("model_kwargs", None)
    bhw = kwargs.pop("batch_hw", None)
    if state is None:
        state = init_state(arch, jax.random.PRNGKey(seq.seed),
                           width_mult=kwargs.pop("width_mult", 1.0),
                           mask_mode="packnet",
                           model_kwargs=mkw, batch_hw=bhw)
    else:
        state.mask_mode = "packnet"
    return run_sequence(arch, tasks, cfg, seq, state=state, **kwargs)


def run_pae_sequence(arch, tasks, cfg: Optional[TrainConfig] = None,
                     seq: Optional[SequenceConfig] = None, **kwargs):
    """PAE comparison row ("pack and expand" — the authors' pre-CPG method,
    paper Exp-1 ≈77% alongside PackNet): PackNet-style prune-and-freeze with
    NO piggyback masks, PLUS the width-expansion ladder when a task's goal
    is unreachable at the current capacity. Exactly the packnet mask mode
    with growth left enabled — CPG minus the picking masks.

    The strict fixed-capacity PackNet row is `run_packnet_sequence` with
    `seq.max_width_mult = 1.0`; PAE requires expansion headroom."""
    seq = seq or SequenceConfig()
    if seq.max_width_mult <= 1.0:
        raise ValueError(
            "PAE is pack-AND-expand: seq.max_width_mult must exceed 1.0 "
            "(use run_packnet_sequence for the fixed-capacity PackNet row)")
    return run_packnet_sequence(arch, tasks, cfg, seq, **kwargs)
