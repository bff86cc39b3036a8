"""Checkpointing: the CPG deliverable is the per-task mask checkpoint.

Reference (ref:CPG_*_main*.py save_checkpoint/load_checkpoint): torch.save of
{model state_dict, ownership `masks`, `shared_layer_info` (per-dataset
piggymask/bias/BN stats/PReLU), dataset history, width multiplier} under
per-task/per-multiplier folders.

TPU-native: one orbax PyTree checkpoint per save — bit-exact round-trip of
shared weights (f32), ownership masks (int8), every task's piggymask and
private/BN collections — plus a JSON sidecar for the non-array metadata
(arch, width multiplier, task names/classes/meta). Orbax gives atomic-rename
durability and async-capable saves; mask selection must survive a round-trip
bit-exactly (tested), because inference correctness IS the mask bits.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..core.state import CPGState, TaskEntry

_META = "cpg_meta.json"


def _to_tree(state: CPGState):
    tasks = {}
    for tid, t in state.tasks.items():
        entry = {"private": t.private, "bn_state": t.bn_state}
        if t.piggymask is not None:
            entry["piggymask"] = t.piggymask
        tasks[str(tid)] = entry
    return {"shared": state.shared, "ownership": state.ownership,
            "tasks": tasks}


_ASYNC = {"ckptr": None}


def _async_checkpointer():
    if _ASYNC["ckptr"] is None:
        _ASYNC["ckptr"] = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC["ckptr"]


_PENDING_RM: list = []


def _flush_removals() -> None:
    import shutil

    while _PENDING_RM:
        shutil.rmtree(_PENDING_RM.pop(), ignore_errors=True)


def remove_after_save(path: str) -> None:
    """Delete checkpoint dir `path` once every in-flight async save has
    landed. Retires a task's transient `.pick` phase checkpoint only AFTER its
    final checkpoint is durably on disk — deleting earlier would reopen the
    crash window the phase checkpoint exists to close, and keeping it forever
    leaks a full-state checkpoint per task (GBs at late-task width 2.0)."""
    _PENDING_RM.append(path)


def wait_for_saves() -> None:
    """Block until every async `save_state(..., block=False)` hit disk."""
    if _ASYNC["ckptr"] is not None:
        _ASYNC["ckptr"].wait_until_finished()
    _flush_removals()


def save_state(state: CPGState, path: str, block: bool = True) -> str:
    """Write a full CPG checkpoint at `path` (a directory).

    `block=False` overlaps the disk write with whatever runs next (the next
    task's pick phase in run_sequence): orbax's async checkpointer copies
    device arrays to host synchronously inside save() — so later donation/
    mutation of the live state cannot corrupt the snapshot — and serializes
    to disk on a background thread. One save in flight at a time; call
    `wait_for_saves()` (or save again / load) to join it. The reference has
    no analogue: torch.save blocks the GPU loop for the full write
    (ref:CPG_*_main*.py save_checkpoint)."""
    path = os.path.abspath(path)
    if block:
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.join(path, "tree"), _to_tree(state), force=True)
    else:
        c = _async_checkpointer()
        c.wait_until_finished()
        _flush_removals()  # prior save landed: retire its superseded phases
        c.save(os.path.join(path, "tree"), _to_tree(state), force=True)
    meta = {
        "arch": state.arch,
        "width_mult": state.width_mult,
        "threshold": state.threshold,
        "mask_mode": getattr(state, "mask_mode", "binary"),
        "model_kwargs": dict(getattr(state, "model_kwargs", None) or {}),
        "in_shape": (list(state.in_shape)
                     if getattr(state, "in_shape", None) else None),
        "tasks": {
            str(tid): {"name": t.name, "num_classes": t.num_classes,
                       "meta": t.meta}
            for tid, t in state.tasks.items()
        },
    }
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f, indent=1)
    return path


def load_state(path: str) -> CPGState:
    wait_for_saves()  # never read past an in-flight async write
    path = os.path.abspath(path)
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    ckptr = ocp.PyTreeCheckpointer()
    tree_path = os.path.join(path, "tree")
    # Restore as host numpy, ignoring saved shardings: checkpoints must load
    # across device topologies (saved single-chip, restored on an 8-device
    # test mesh, or vice versa); jax re-places arrays on first use.
    md = ckptr.metadata(tree_path).item_metadata.tree
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), md)
    tree = ckptr.restore(tree_path, restore_args=restore_args)
    tasks = {}
    for tid_s, tm in meta["tasks"].items():
        entry = tree["tasks"][tid_s]
        tasks[int(tid_s)] = TaskEntry(
            name=tm["name"],
            num_classes=tm["num_classes"],
            piggymask=entry.get("piggymask"),
            private=entry["private"],
            bn_state=entry["bn_state"],
            meta=tm.get("meta") or {},
        )
    state = CPGState(
        arch=meta["arch"],
        width_mult=meta["width_mult"],
        shared=tree["shared"],
        ownership=jax.tree.map(lambda a: a.astype(np.int8),
                               tree["ownership"]),
        tasks=tasks,
        threshold=meta["threshold"],
        mask_mode=meta.get("mask_mode", "binary"),
        model_kwargs=meta.get("model_kwargs") or {},
        in_shape=(tuple(meta["in_shape"])
                  if meta.get("in_shape") else None),
    )
    return state


def latest_checkpoint(root: str) -> Optional[str]:
    """Most recent checkpoint dir under `root` (named task<k>_<phase> or any)."""
    if not os.path.isdir(root):
        return None
    cands = [os.path.join(root, d) for d in os.listdir(root)
             if os.path.exists(os.path.join(root, d, _META))]
    return max(cands, key=os.path.getmtime) if cands else None
