"""Export a CPGState back into the reference's torch checkpoint layout.

The inverse of train/pretrained.convert_torch_cpg_checkpoint: produces the
torch.save dict the reference Managers write (ref:CPG_*_main*.py
save_checkpoint — backbone state_dict + pruner `masks` + per-dataset
`shared_layer_info` + dataset history + width multiplier), so a reference
user can take checkpoints OUT of this stack and evaluate them with the
original PyTorch code (or archive them in the format its released
checkpoints use).

Module naming is the genuine torch layout per architecture:
  - vgg16_bn_cifar: torchvision vgg16_bn `features.N` Sequential indices
    (conv,bn,relu triplets + maxpool singletons from the cfg list)
  - resnet50: torchvision names (`layerL.B.convN`, `layerL.B.downsample.{0,1}`)
  - spherenet20: sphere20a names (`conv{s}_{j}`, `relu{s}_{j}`, fc5, fc6)

Orientation transforms are the exact inverses of the import direction:
conv HWIO -> OIHW; SphereNet fc5 rows go NHWC-flat -> NCHW-flat; heads are
stored torch-Linear (out, in) except AngleLinear which the reference keeps
as (in, out).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.state import CPGState


def _inv_conv(t) -> np.ndarray:
    """HWIO -> torch OIHW (kernels, ownership masks, piggymasks alike)."""
    return np.transpose(np.asarray(t), (3, 2, 0, 1))


def _inv_fc5(t) -> np.ndarray:
    """(h*w*c, out) NHWC-flat -> torch (out, c*h*w) NCHW-flat."""
    from ..models.spherenet import _FLAT_HW

    t = np.asarray(t)
    h, w = _FLAT_HW
    c = t.shape[0] // (h * w)
    return (t.reshape(h, w, c, t.shape[1]).transpose(2, 0, 1, 3)
            .reshape(c * h * w, t.shape[1]).T)


def _vgg_mods():
    """cpg index -> torch Sequential module, from the shared cfg list."""
    from ..models.vgg import CFG_VGG16

    conv_mods, bn_mods, idx = [], [], 0
    for v in CFG_VGG16:
        if v == "M":
            idx += 1
            continue
        conv_mods.append(f"features.{idx}")
        bn_mods.append(f"features.{idx + 1}")
        idx += 3  # conv, bn, relu
    return conv_mods, bn_mods


def _rn_conv_mod(key: str) -> str:
    parts = key.split("/")
    if parts[0] == "conv1":
        return "conv1"
    layer, block = parts[0], parts[1][len("block"):]
    if parts[2] == "downsample":
        return f"{layer}.{block}.downsample.0"
    return f"{layer}.{block}.{parts[2]}"


def _rn_bn_mod(base: str) -> str:
    parts = base.split("/")
    if parts[0] == "bn1":
        return "bn1"
    layer, block = parts[0], parts[1][len("block"):]
    if parts[2] == "downsample_bn":
        return f"{layer}.{block}.downsample.1"
    return f"{layer}.{block}.{parts[2]}"


def _sph_conv_mod(key: str) -> str:
    parts = key.split("/")
    if parts[0] == "fc5":
        return "fc5"
    s = parts[0][len("stage"):]
    if parts[1] == "down":
        return f"conv{s}_1"
    u, half = int(parts[1][len("unit"):]), int(parts[2][len("conv"):])
    return f"conv{s}_{2 + 2 * u + (half - 1)}"


def _sph_slope_mod(key: str) -> str:
    if key.endswith("down_prelu/slope"):
        return f"relu{key.split('/')[0][len('stage'):]}_1"
    parts = key.split("/")  # stageS/unitU/preluH/slope
    s = parts[0][len("stage"):]
    u, half = int(parts[1][len("unit"):]), int(parts[2][len("prelu"):])
    return f"relu{s}_{2 + 2 * u + (half - 1)}"


def _conv_mod_of(state: CPGState):
    """shared key -> (torch module name, inverse transform) for the arch."""
    if state.arch == "vgg16_bn_cifar":
        conv_mods, _ = _vgg_mods()

        def f(key):
            i = int(key.split("/")[1][len("conv"):])
            return conv_mods[i], _inv_conv
    elif state.arch == "resnet50":
        def f(key):
            return _rn_conv_mod(key), _inv_conv
    elif state.arch == "spherenet20":
        def f(key):
            if key == "fc5/kernel":
                return "fc5", _inv_fc5
            return _sph_conv_mod(key), _inv_conv
    else:
        raise NotImplementedError(
            f"torch export supports vgg16_bn_cifar/resnet50/spherenet20; "
            f"got {state.arch!r}")
    return f


def _bn_mod_of(arch: str, base: str) -> str:
    if arch == "vgg16_bn_cifar":
        _, bn_mods = _vgg_mods()
        return bn_mods[int(base.split("/")[1][len("bn"):])]
    return _rn_bn_mod(base)


def export_torch_cpg_checkpoint(state: CPGState) -> Dict:
    """CPGState -> reference torch.save dict (plain numpy arrays — feed it to
    torch.save, or load it straight back via convert_torch_cpg_checkpoint).

    The backbone state_dict carries the LAST (active) task's BN/PReLU/bias
    values, as the reference Manager leaves them after training the newest
    task; every task's copies (plus piggymasks and heads) ride
    shared_layer_info / classifiers.{i} exactly like ref save_checkpoint."""
    mod_of = _conv_mod_of(state)
    head = ("classifier_angle" if state.arch == "spherenet20"
            else "classifier")

    sd: Dict[str, np.ndarray] = {}
    masks: Dict[str, np.ndarray] = {}
    for key in sorted(state.shared):
        mod, inv = mod_of(key)
        sd[f"{mod}.weight"] = inv(state.shared[key])
        masks[mod] = inv(state.ownership[key])

    task_ids = state.task_ids()
    history = [state.tasks[tid].name for tid in task_ids]
    sli: Dict[str, Dict] = {}
    for tid in task_ids:
        t = state.tasks[tid]
        info: Dict[str, Dict] = {}
        for key in sorted(t.private):
            if key.endswith("/scale"):
                base = key[:-len("/scale")]
                mod = _bn_mod_of(state.arch, base)
                info.setdefault("bn_layer_weight", {})[mod] = np.asarray(
                    t.private[key])
                info.setdefault("bn_layer_bias", {})[mod] = np.asarray(
                    t.private[f"{base}/bias"])
                info.setdefault("bn_layer_running_mean", {})[mod] = \
                    np.asarray(t.bn_state[f"{base}/mean"])
                info.setdefault("bn_layer_running_var", {})[mod] = \
                    np.asarray(t.bn_state[f"{base}/var"])
            elif key.endswith("/slope"):
                info.setdefault("prelu_layer_weight", {})[
                    _sph_slope_mod(key)] = np.asarray(t.private[key])
            elif key == "fc5/bias":
                info.setdefault("bias", {})["fc5"] = np.asarray(t.private[key])
        if t.piggymask is not None:
            pm = {}
            for key in sorted(t.piggymask):
                mod, inv = mod_of(key)
                pm[mod] = inv(t.piggymask[key])
            info["piggymask"] = pm
        sli[t.name] = info
        # per-dataset head: torch Linear (out, in); AngleLinear (in, out)
        hk = np.asarray(t.private[f"{head}/kernel"])
        sd[f"classifiers.{tid - 1}.weight"] = (
            hk if head == "classifier_angle" else hk.T)
        if f"{head}/bias" in t.private:
            sd[f"classifiers.{tid - 1}.bias"] = np.asarray(
                t.private[f"{head}/bias"])

    # backbone private entries = active (last) task's values
    last = state.tasks[task_ids[-1]]
    for key in sorted(last.private):
        if key.endswith("/scale"):
            base = key[:-len("/scale")]
            mod = _bn_mod_of(state.arch, base)
            sd[f"{mod}.weight"] = np.asarray(last.private[key])
            sd[f"{mod}.bias"] = np.asarray(last.private[f"{base}/bias"])
            sd[f"{mod}.running_mean"] = np.asarray(
                last.bn_state[f"{base}/mean"])
            sd[f"{mod}.running_var"] = np.asarray(last.bn_state[f"{base}/var"])
        elif key.endswith("/slope"):
            sd[f"{_sph_slope_mod(key)}.weight"] = np.asarray(last.private[key])
        elif key == "fc5/bias":
            sd["fc5.bias"] = np.asarray(last.private[key])
    if head == "classifier_angle":
        sd["fc6.weight"] = np.asarray(last.private[f"{head}/kernel"])

    return {
        "state_dict": sd,
        "masks": masks,
        "shared_layer_info": sli,
        "dataset_history": history,
        "dataset2num_classes": {t.name: t.num_classes
                                for t in state.tasks.values()},
        "network_width_multiplier": state.width_mult,
    }
