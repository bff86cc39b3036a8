"""Manager: train / eval / prune-retrain loops over the jitted steps.

Reference: the `Manager` class defined in each main script
(ref:CPG_cifar100_main_normal.py etc.) — epoch loops, accuracy metering,
LR scheduling, gradual pruning driven from the host, checkpoint save/load.

TPU-native deltas: all per-step math lives in ONE donated jit (train/step.py);
prune events are a second tiny jitted program (core/pruner.py) fired every
`prune_freq` steps during the prune window; the ratio is a traced scalar so
the whole compact loop reuses one executable. Epoch-level LR control writes a
scalar into the injected-hyperparams optimizer state (no recompile).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import pruner
from ..core.state import CPGState
from ..data.cifar import iterate_batches
from .step import TrainConfig, make_eval_step, make_train_step, set_lr


@dataclasses.dataclass
class PhaseResult:
    acc: float
    loss: float
    steps: int
    seconds: float
    images_per_sec: float


def _lr_at(base_lr: float, epoch: int, total_epochs: int, schedule: str) -> float:
    if schedule == "cosine":
        return 0.5 * base_lr * (1 + math.cos(math.pi * epoch / max(total_epochs, 1)))
    if schedule == "warmup_cosine":
        # transformer-standard: linear warmup over the first 10% of epochs
        # (>=1), then the cosine walk over the rest (models/vit.py + adam)
        warm = max(1, int(0.1 * total_epochs))
        if epoch < warm:
            return base_lr * (epoch + 1) / warm
        frac = (epoch - warm) / max(total_epochs - warm, 1)
        return 0.5 * base_lr * (1 + math.cos(math.pi * frac))
    if schedule == "constant":
        return base_lr
    if schedule == "step":
        # reference-style step decay (ref:experiment*/ *.sh drive torch
        # MultiStepLR-like drops): x0.1 at 50% and 75% of the phase
        # [M — recalled milestones; re-verify if the mount appears]
        frac = epoch / max(total_epochs, 1)
        return base_lr * (0.1 ** ((frac >= 0.5) + (frac >= 0.75)))
    raise ValueError(schedule)


class Manager:
    """Drives one task's phases: pick/finetune -> gradual prune -> retrain."""

    def __init__(
        self,
        state: CPGState,
        model_fn: Callable,
        task_id: int,
        data: Dict[str, np.ndarray],
        cfg: TrainConfig,
        batch_size: int = 128,
        augment_fn: Optional[Callable] = None,
        preprocess_fn: Optional[Callable] = None,
        loss_fn=None,
        seed: int = 0,
        lr_schedule: str = "cosine",
        native_loader: bool = False,
        jsonl_path: Optional[str] = None,
        mesh=None,
    ):
        self.state = state
        self.model_fn = model_fn
        self.task_id = task_id
        self.task = state.tasks[task_id]
        self.data = data
        self.cfg = cfg
        self.batch_size = batch_size
        self.lr_schedule = lr_schedule
        self.np_rng = np.random.RandomState(seed)
        self.rng = jax.random.PRNGKey(seed)
        self.it = 0  # global step (drives annealed losses, e.g. A-Softmax)
        self.has_piggymask = self.task.piggymask is not None
        self.mesh = mesh

        kwargs = dict(
            num_classes=self.task.num_classes,
            mult=state.width_mult,
            has_piggymask=self.has_piggymask,
            cfg=cfg,
            model_kwargs=state.forward_kwargs(task_id) or None,
            mask_mode=getattr(state, "mask_mode", "binary"),
        )
        extra = {} if loss_fn is None else {"loss_fn": loss_fn}
        if mesh is not None:
            # Multi-device path (SURVEY §5 distributed row): batch-sharded
            # step over the mesh, grads/metrics psum'd by XLA over ICI. State
            # is replicated, EXCEPT when the mesh has a model axis > 1: then
            # sharable kernels + their ownership/piggymask trees shard along
            # output channels (TP for wide grown networks) and XLA partitions
            # the convs/matmuls, all-gathering activations where needed. The
            # state trees are placed on the mesh once here; batches are
            # sharded per step in _train_batches' consumer.
            from ..parallel.mesh import (make_parallel_eval_step,
                                         make_parallel_train_step, place_state,
                                         shared_shardings)
            from .step import build_eval_step, build_train_step

            n_data = mesh.shape["data"]
            if batch_size % n_data:
                raise ValueError(
                    f"batch_size {batch_size} not divisible by data-axis "
                    f"size {n_data}")
            model_sharded = mesh.shape.get("model", 1) > 1
            raw_step, (self.opt_w, self.opt_pm) = build_train_step(
                model_fn, augment_fn=augment_fn, **kwargs, **extra)
            ksh = (shared_shardings(mesh, state.shared, model_sharded=True)
                   if model_sharded else None)
            state.shared = place_state(mesh, state.shared, ksh)
            state.ownership = place_state(mesh, state.ownership, ksh)
            if self.has_piggymask:
                self.task.piggymask = place_state(mesh, self.task.piggymask,
                                                  ksh)
            self.task.private = place_state(mesh, self.task.private)
            self.task.bn_state = place_state(mesh, self.task.bn_state)
            tp_kw = dict(model_sharded=model_sharded,
                         shared_template=state.shared,
                         has_piggymask=self.has_piggymask,
                         compiler_options=cfg.compiler_options)
            if model_sharded:
                # init optimizer states from the PLACED params so momenta /
                # Adam moments inherit the kernel shardings (zeros_like),
                # then pin those layouts into the jitted step
                from ..parallel.mesh import opt_state_shardings

                self.reset_optimizers()
                tp_kw["opt_shardings"] = (
                    opt_state_shardings(mesh, self.opt_w_state),
                    opt_state_shardings(mesh, self.opt_pm_state))
            self.train_step = make_parallel_train_step(raw_step, mesh, **tp_kw)
            self.eval_step = make_parallel_eval_step(
                build_eval_step(model_fn, preprocess_fn=preprocess_fn,
                                **kwargs), mesh,
                **{k: v for k, v in tp_kw.items() if k != "opt_shardings"})
        else:
            self.train_step, (self.opt_w, self.opt_pm) = make_train_step(
                model_fn, augment_fn=augment_fn, **kwargs, **extra
            )
            self.eval_step = make_eval_step(
                model_fn, preprocess_fn=preprocess_fn, **kwargs)
        self._jsonl = None
        if jsonl_path:
            from ..utils import JsonlWriter

            self._jsonl = JsonlWriter(jsonl_path)
        self._batcher = None
        if native_loader:
            from ..data.native_loader import NativeBatcher, native_available

            if native_available():
                self._batcher = NativeBatcher(
                    np.ascontiguousarray(data["train_x"]),
                    data["train_y"], batch_size, seed=seed)
        self.reset_optimizers()

    def _train_batches(self, steps_per_epoch):
        """One epoch of training batches: native C++ prefetch ring when
        enabled, NumPy gather otherwise (both read through memmaps for
        larger-than-RAM datasets — data/stream.py). The DevicePrefetcher
        keeps the next batch's host->device transfer (mesh-sharded when
        multi-device) in flight while the current step computes."""
        from ..data.stream import DevicePrefetcher

        if self._batcher is not None:
            it = self._batcher.batches(steps_per_epoch)
        else:
            it = iterate_batches(self.data["train_x"], self.data["train_y"],
                                 self.batch_size, self.np_rng, train=True)
        sharding = None
        if self.mesh is not None:
            from ..parallel.mesh import batch_sharding

            sharding = batch_sharding(self.mesh)
            if jax.process_count() > 1:
                # Multi-process pod: every process draws the SAME global
                # shuffle (same seed) and feeds only ITS rows; the prefetcher
                # assembles the global array from the per-process shards
                # (make_array_from_process_local_data) — device_put of the
                # full batch would treat each host's copy as the whole global
                # batch (distributed.py contract).
                from ..parallel.distributed import local_batch_slice

                sl = local_batch_slice(self.mesh, self.batch_size)
                it = ((x[sl], y[sl]) for x, y in it)
        return DevicePrefetcher(it, sharding=sharding)

    # -- optimizer state ----------------------------------------------------
    def reset_optimizers(self):
        self.opt_w_state = self.opt_w.init(
            {"shared": self.state.shared, "private": self.task.private}
        )
        pm = self.task.piggymask if self.has_piggymask else {}
        self.opt_pm_state = self.opt_pm.init(pm)

    # -- phases ---------------------------------------------------------------
    def train(
        self,
        epochs: int,
        base_lr: Optional[float] = None,
        prune_to: Optional[float] = None,
        prune_freq: int = 50,
        prune_begin_frac: float = 0.0,
        prune_end_frac: float = 0.8,
        prune_n0=None,
        start_epoch: int = 0,
        epoch_callback: Optional[Callable[[int], None]] = None,
    ) -> PhaseResult:
        """Train `epochs`. If `prune_to` is set, runs the gradual-prune window
        inside (ref:--mode prune): cubic schedule from current sparsity to
        `prune_to`, prune event every `prune_freq` steps, then the remaining
        steps retrain at fixed final sparsity.

        `prune_n0` fixes the reference count the sparsity target is a fraction
        OF (the task's post-pick owned counts). Without it each call snapshots
        the current counts, which makes successive ratio phases compound
        (0.5-after-0.3 keeps 35%, not 50%). The compact loop in
        train/sequence.py passes the post-pick snapshot so candidate ratios
        stay absolute, matching the reference's per-ratio semantics.

        `start_epoch` re-enters an interrupted epoch loop (ref
        --restore_epoch): the LR schedule resumes at the right point; the
        caller restores `self.it` and state separately; optimizers are
        rebuilt fresh (the reference's resume constructs fresh optimizers
        over the loaded checkpoint too). `epoch_callback(completed_epochs)`
        fires after EVERY epoch with the live trees synced back into
        self.state/self.task, so run_task can checkpoint mid-phase; it is
        skipped in the prune window (gradual-prune schedule state lives in
        step_i, which a pick-phase resume reconstructs but a mid-window
        resume would not)."""
        st, task = self.state, self.task
        base_lr = self.cfg.lr if base_lr is None else base_lr
        n = len(self.data["train_x"])
        steps_per_epoch = max(n // self.batch_size, 1)
        total_steps = epochs * steps_per_epoch

        n0 = None
        prune_begin = prune_end = -1
        init_sparsity = 0.0
        if prune_to is not None:
            n0 = prune_n0 if prune_n0 is not None else jax.tree.map(
                int, pruner.snapshot_owned_counts(st.ownership, self.task_id))
            init_sparsity = float(pruner.task_sparsity(
                st.ownership, self.task_id, n0))
            prune_begin = int(prune_begin_frac * total_steps)
            prune_end = max(int(prune_end_frac * total_steps), prune_begin + 1)

        pm = task.piggymask if self.has_piggymask else {}
        shared, ownership = st.shared, st.ownership
        private, bn_state = task.private, task.bn_state
        opt_w_state, opt_pm_state = self.opt_w_state, self.opt_pm_state

        step_i = start_epoch * steps_per_epoch
        losses, accs = [], []
        t0 = time.perf_counter()
        metrics = {}
        for epoch in range(start_epoch, epochs):
            opt_w_state = set_lr(
                opt_w_state, _lr_at(base_lr, epoch, epochs, self.lr_schedule))
            for bx, by in self._train_batches(steps_per_epoch):
                if (
                    prune_to is not None
                    and prune_begin <= step_i <= prune_end
                    and ((step_i - prune_begin) % prune_freq == 0
                         or step_i == prune_end)
                ):
                    # the `or step_i == prune_end` forces the final event to
                    # land EXACTLY at the window end regardless of prune_freq
                    # alignment, so every remaining retrain step sees final
                    # sparsity (the reference reaches the target inside the
                    # schedule and retrains at final sparsity)
                    from ..core.schedule import cubic_sparsity

                    target = cubic_sparsity(
                        step_i, prune_begin, prune_end, init_sparsity, prune_to)
                    shared, ownership = pruner.gradual_prune(
                        shared, ownership, self.task_id, target, n0)
                # bx/by already device-placed (mesh-sharded) by the prefetcher
                self.rng, sub = jax.random.split(self.rng)
                (shared, pm, private, bn_state, opt_w_state, opt_pm_state,
                 metrics) = self.train_step(
                    shared, pm, private, bn_state, opt_w_state, opt_pm_state,
                    ownership, self.task_id, bx, by, sub, self.it,
                )
                step_i += 1
                self.it += 1
            losses.append(float(metrics["loss"]))
            accs.append(float(metrics["acc"]))
            if epoch_callback is not None:
                # sync the live trees back so the callback (intra-phase
                # checkpointing) sees current state, then let it run; orbax
                # copies device->host synchronously inside save(), so the
                # next step's donation cannot corrupt the snapshot
                st.shared, st.ownership = shared, ownership
                task.private, task.bn_state = private, bn_state
                if self.has_piggymask:
                    task.piggymask = pm
                self.opt_w_state, self.opt_pm_state = opt_w_state, opt_pm_state
                epoch_callback(epoch + 1)
        jax.block_until_ready(shared)
        dt = time.perf_counter() - t0
        steps_run = step_i - start_epoch * steps_per_epoch
        if losses and not math.isfinite(losses[-1]):
            import logging

            logging.getLogger("cpg_tpu").warning(
                "task %d (%s): NON-FINITE loss %s — training diverged "
                "(lower lr or set TrainConfig.grad_clip_norm); weights are "
                "likely NaN (run core.invariants.check_state)",
                self.task_id, self.task.name, losses[-1])

        # safety net: if prune_end == total_steps the loop never reaches it
        # (step_i stops at total_steps-1); land exactly on the target anyway
        if prune_to is not None:
            shared, ownership = pruner.gradual_prune(
                shared, ownership, self.task_id, prune_to, n0)

        st.shared, st.ownership = shared, ownership
        task.private, task.bn_state = private, bn_state
        if self.has_piggymask:
            task.piggymask = pm
        self.opt_w_state, self.opt_pm_state = opt_w_state, opt_pm_state

        acc = self.eval()
        if self._jsonl:
            self._jsonl.write(
                event="phase", task_id=self.task_id, task=self.task.name,
                epochs=epochs, steps=steps_run, prune_to=prune_to,
                loss=losses[-1] if losses else None, acc=acc, seconds=dt,
                images_per_sec=steps_run * self.batch_size / max(dt, 1e-9))
        return PhaseResult(
            acc=acc,
            loss=losses[-1] if losses else float("nan"),
            steps=steps_run,
            seconds=dt,
            images_per_sec=steps_run * self.batch_size / max(dt, 1e-9),
        )

    def eval(self, task_id: Optional[int] = None) -> float:
        """Task-conditioned top-1 on the task's test split.

        Batches are padded to the static batch size (XLA shapes) with label
        -1 — argmax never returns it, so the step's device-side `acc_sum`
        counts EXACTLY the valid rows. The count comes back as one replicated
        scalar: no per-batch logits transfer to the host, and on a
        multi-process pod (where the sharded logits are not even addressable)
        every process reads the same globally-reduced value."""
        task_id = self.task_id if task_id is None else task_id
        task = self.state.tasks[task_id]
        pm = task.piggymask if task.piggymask is not None else {}
        x, y = self.data["test_x"], self.data["test_y"]
        n, bs = len(x), self.batch_size
        n_proc = jax.process_count() if self.mesh is not None else 1
        correct, total = 0, 0
        for s in range(0, n, bs):
            # int32 labels: the -1 pad must stay -1 (an unsigned dtype would
            # wrap it to a potentially-valid class id)
            bx, by = x[s:s + bs], np.asarray(y[s:s + bs], np.int32)
            nvalid = len(by)
            if nvalid < bs:  # pad to the compiled batch shape
                pad = bs - nvalid
                bx = np.concatenate([bx, np.repeat(bx[-1:], pad, axis=0)])
                by = np.concatenate([by, np.full(pad, -1, by.dtype)])
            if self.mesh is not None:
                from ..parallel.distributed import (local_batch_slice,
                                                    put_global_batch)

                if n_proc > 1:
                    sl = local_batch_slice(self.mesh, bs)
                    bx, by = bx[sl], by[sl]
                bx, by = put_global_batch(self.mesh, bx, by)
            _, metrics = self.eval_step(
                self.state.shared, pm, task.private, task.bn_state,
                self.state.ownership, task_id, bx, by,
            )
            correct += int(metrics["acc_sum"])
            total += nvalid
        return correct / max(total, 1)

    # -- one-shot prune (ref --one_shot_prune_perc) --------------------------
    def one_shot_prune(self, ratio: float):
        self.state.shared, self.state.ownership = pruner.one_shot_prune(
            self.state.shared, self.state.ownership, self.task_id,
            jnp.float32(ratio),
        )
