"""ImageNet-pretrained task 1 for the fine-grained sequence.

Reference (ref:CPG_imagenet_main.py --use_imagenet_pretrained): task 1 of the
fine-grained chain is a torchvision ImageNet ResNet-50 whose weights are all
marked owned-by-task-1 and then compacted; CUBS/Cars/... pick from it.

No network here, so weights arrive as a user-supplied npz whose keys match
the cpg_tpu param naming (a converter from torch state_dict key order is
included for when torchvision weights are available:
conv HWIO <- torch OIHW transpose, dense (in,out) <- torch (out,in) T).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..core.ownership import assign_free_to_task
from ..core.state import CPGState, TaskEntry


def adopt_pretrained_task1(
    state: CPGState,
    name: str,
    num_classes: int,
    shared: Dict[str, np.ndarray],
    private: Optional[Dict[str, np.ndarray]] = None,
    bn_state: Optional[Dict[str, np.ndarray]] = None,
) -> int:
    """Install pretrained weights as task 1: every shared entry becomes owned
    by task 1 (ref: the whole pretrained net belongs to the first task)."""
    if state.num_tasks != 0:
        raise ValueError("pretrained adoption requires a fresh state")
    for k, w in shared.items():
        if k not in state.shared:
            raise KeyError(f"pretrained key {k} not in model: "
                           f"{sorted(state.shared)[:3]}...")
        if tuple(w.shape) != tuple(state.shared[k].shape):
            raise ValueError(f"{k}: {w.shape} != {state.shared[k].shape}")
        state.shared[k] = jnp.asarray(w, jnp.float32)
    state.ownership = assign_free_to_task(state.ownership, 1)
    # private/bn default to the freshly initialized ones unless supplied
    from ..models import framework as fw, get_model

    model_fn, in_shape = get_model(state.arch)
    import jax

    _, priv0, bn0 = fw.init(jax.random.PRNGKey(0),
                            model_fn, jnp.zeros((1, *in_shape)),
                            num_classes=num_classes, mult=state.width_mult)
    if private:
        priv0 = {**priv0, **{k: jnp.asarray(v) for k, v in private.items()}}
    if bn_state:
        bn0 = {**bn0, **{k: jnp.asarray(v) for k, v in bn_state.items()}}
    state.tasks[1] = TaskEntry(name=name, num_classes=num_classes,
                               piggymask=None, private=priv0, bn_state=bn0)
    return 1


def convert_torch_resnet50(state_dict: Dict[str, np.ndarray]):
    """torchvision ResNet-50 state_dict -> (shared, private, bn_state) in
    cpg_tpu naming. Accepts a {key: ndarray} dict (e.g. torch tensors already
    .numpy()'d) so torch itself is not required here."""
    shared, private, bn = {}, {}, {}

    def conv(t):  # OIHW -> HWIO
        return np.transpose(t, (2, 3, 1, 0))

    name_map = {"conv1": "conv1", "bn1": "bn1"}
    for k, v in state_dict.items():
        v = np.asarray(v)
        if k.startswith("fc."):
            if k.endswith("weight"):
                private["classifier/kernel"] = v.T
            else:
                private["classifier/bias"] = v
            continue
        parts = k.split(".")
        if parts[0] in name_map:
            base = name_map[parts[0]]
        elif parts[0].startswith("layer"):
            base = f"{parts[0]}/block{parts[1]}"
            rest = parts[2]
            if rest == "downsample":
                base += "/downsample" + ("" if parts[3] == "0" else "_bn")
                parts = [None, None, None, None, parts[4]]
            else:
                base += f"/{rest}"
            k = ".".join(p for p in parts if p)
        else:
            continue
        leaf = k.split(".")[-1]
        if leaf == "weight" and v.ndim == 4:
            shared[f"{base}/kernel"] = conv(v)
        elif leaf == "weight":
            private[f"{base}/scale"] = v
        elif leaf == "bias":
            private[f"{base}/bias"] = v
        elif leaf == "running_mean":
            bn[f"{base}/mean"] = v
        elif leaf == "running_var":
            bn[f"{base}/var"] = v
    return shared, private, bn
