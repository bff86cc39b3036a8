"""CPG model state: the one container the whole cycle mutates.

Replaces the reference's scattered bookkeeping (model.state_dict() + `masks`
dict + `shared_layer_info` nested dict + dataset history + width multiplier,
all saved by torch.save in the Manager — ref:CPG_*_main*.py save_checkpoint).

Structure:
  shared     {layer/kernel: f32}   sharable weights (ownership-governed)
  ownership  {layer/kernel: int8}  0=free, k=owned by task k
  tasks      {task_id: TaskEntry}  per-task piggymask + private + BN stats
  width_mult float                 current network width multiplier
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional


@dataclasses.dataclass
class TaskEntry:
    name: str                      # dataset/task name (e.g. 'aquatic_mammals')
    num_classes: int
    piggymask: Optional[Dict]      # None for task 1 (nothing to pick from)
    private: Dict                  # BN affine, biases, PReLU, head
    bn_state: Dict                 # BN running mean/var
    meta: Dict[str, Any] = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class CPGState:
    arch: str
    width_mult: float
    shared: Dict
    ownership: Dict
    tasks: Dict[int, TaskEntry] = dataclasses.field(default_factory=dict)
    threshold: float = 5e-3        # binarizer threshold (ref DEFAULT_THRESHOLD)
    mask_mode: str = "binary"      # 'binary' (ref Binarizer) | 'ternary'
                                   # (ref Ternarizer)
    model_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # ^ arch-level forward kwargs fixed at init_state time. SHAPE-AFFECTING
    # options (vocab size, depth, dim, heads...) must live here — they size
    # the shared kernels and every later fw.init (start_task, grow_state)
    # must agree. Per-task kwargs in TaskEntry.meta["model_kwargs"]
    # (head_type, causal, ...) override these at apply time.
    in_shape: Optional[tuple] = None
    # ^ per-example input shape when init_state overrode the registry
    # default (batch_hw=... — e.g. a custom text seq_len); None = registry.

    @property
    def num_tasks(self) -> int:
        return len(self.tasks)

    def task_ids(self):
        return sorted(self.tasks)

    def forward_kwargs(self, task_id: Optional[int] = None,
                       override: Optional[Dict] = None) -> Dict[str, Any]:
        """Arch-level model_kwargs merged with task `task_id`'s stored kwargs
        (task wins); `override` replaces the task-level layer entirely."""
        mkw = dict(getattr(self, "model_kwargs", None) or {})
        if override is not None:
            mkw.update(override)
        elif task_id is not None and task_id in self.tasks:
            mkw.update(self.tasks[task_id].meta.get("model_kwargs") or {})
        return mkw
