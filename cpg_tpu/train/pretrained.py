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
        for k, v in private.items():
            v = jnp.asarray(v)
            if k in priv0 and tuple(v.shape) != tuple(priv0[k].shape):
                # e.g. a pretrained head whose class count differs from the
                # adopted task's — keep the fresh one rather than installing
                # a shape the forward was not built for
                continue
            priv0[k] = v
    if bn_state:
        bn0 = {**bn0, **{k: jnp.asarray(v) for k, v in bn_state.items()}}
    state.tasks[1] = TaskEntry(name=name, num_classes=num_classes,
                               piggymask=None, private=priv0, bn_state=bn0)
    return 1


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference .pth/.pth.tar checkpoint into {key: ndarray}.

    The reference releases torch.save dicts ({'model_state_dict'|'state_dict'
    : ..., 'masks': ..., 'shared_layer_info': ...}, ref:README.md links, or a
    bare state_dict). torch (CPU build) decodes; keys keep their dotted torch
    names; a leading 'module.' (DataParallel) is stripped."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for k in ("model_state_dict", "state_dict", "model"):
        if isinstance(obj, dict) and k in obj and isinstance(obj[k], dict):
            obj = obj[k]
            break
    out = {}
    for k, v in obj.items():
        if not hasattr(v, "numpy"):
            continue
        out[k[len("module."):] if k.startswith("module.") else k] = \
            v.detach().cpu().numpy()
    return out


def convert_torch_vgg16_bn(state_dict: Dict[str, np.ndarray]):
    """VGG16-BN state_dict (reference custom_vgg / torchvision layout:
    features.N.* with BN after each conv) -> (shared, private, bn_state) in
    cpg_tpu naming (models/vgg.py: features/conv{i}, features/bn{i},
    classifier head). Order-based: the i-th 4D features weight is conv i, the
    i-th BN parameter set is bn i — robust to the exact Sequential indices.
    The final 2D weight becomes the (task-private) classifier head."""
    shared, private, bn = {}, {}, {}
    feats = {}
    for k, v in state_dict.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[0] in ("features", "shared"):  # ref custom_vgg uses a
            # 'features'/'shared' Sequential for the conv trunk
            feats.setdefault(int(parts[1]), {})[parts[-1]] = v
    conv_i = bn_i = 0
    for idx in sorted(feats):
        p = feats[idx]
        if "weight" in p and p["weight"].ndim == 4:
            shared[f"features/conv{conv_i}/kernel"] = np.transpose(
                p["weight"], (2, 3, 1, 0))  # OIHW -> HWIO
            conv_i += 1
        elif "running_mean" in p:
            private[f"features/bn{bn_i}/scale"] = p["weight"]
            private[f"features/bn{bn_i}/bias"] = p["bias"]
            bn[f"features/bn{bn_i}/mean"] = p["running_mean"]
            bn[f"features/bn{bn_i}/var"] = p["running_var"]
            bn_i += 1
    # classifier: last 2D weight anywhere outside features
    heads = [(k, np.asarray(v)) for k, v in state_dict.items()
             if np.asarray(v).ndim == 2 and not k.startswith(("features.",
                                                              "shared."))]
    if heads:
        k, w = heads[-1]
        private["classifier/kernel"] = w.T  # torch (out,in) -> (in,out)
        bkey = k.rsplit(".", 1)[0] + ".bias"
        if bkey in state_dict:
            private["classifier/bias"] = np.asarray(state_dict[bkey])
    return shared, private, bn


def convert_torch_spherenet20(state_dict: Dict[str, np.ndarray]):
    """sphere20a-style state_dict (conv{s}_{j}/relu{s}_{j}/fc5/fc6 naming,
    ref:models/spherenet.py lineage) -> (shared, private, bn_state={}) in
    cpg_tpu naming (models/spherenet.py: stage{s}/down, stage{s}/unit{u}/
    conv{1,2} + task-private PReLU slopes, fc5, classifier_angle).

    fc5 needs a ROW PERMUTATION, not just a transpose: torch flattens NCHW
    (c,h,w)-major while this stack flattens NHWC (h,w,c)-major."""
    from ..models.spherenet import STAGES, _FLAT_HW

    shared, private = {}, {}
    h, w = _FLAT_HW

    def conv(t):
        return np.transpose(np.asarray(t), (2, 3, 1, 0))

    for si, (_, units) in enumerate(STAGES):
        s = si + 1
        shared[f"stage{s}/down/kernel"] = conv(state_dict[f"conv{s}_1.weight"])
        private[f"stage{s}/down_prelu/slope"] = np.asarray(
            state_dict[f"relu{s}_1.weight"])
        for u in range(units):
            for half in (1, 2):
                j = 2 + 2 * u + (half - 1)
                shared[f"stage{s}/unit{u}/conv{half}/kernel"] = conv(
                    state_dict[f"conv{s}_{j}.weight"])
                private[f"stage{s}/unit{u}/prelu{half}/slope"] = np.asarray(
                    state_dict[f"relu{s}_{j}.weight"])
    fc5 = np.asarray(state_dict["fc5.weight"])  # (512, c*h*w) torch Linear
    c = fc5.shape[1] // (h * w)
    # torch rows (after .T) are (c,h,w)-ordered; ours are (h,w,c)-ordered
    shared["fc5/kernel"] = (
        fc5.T.reshape(c, h, w, fc5.shape[0])
        .transpose(1, 2, 0, 3)
        .reshape(h * w * c, fc5.shape[0]))
    if "fc5.bias" in state_dict:
        private["fc5/bias"] = np.asarray(state_dict["fc5.bias"])
    if "fc6.weight" in state_dict:  # AngleLinear stores (in, out) already
        w6 = np.asarray(state_dict["fc6.weight"])
        private["classifier_angle/kernel"] = (
            w6 if w6.shape[0] == fc5.shape[0] else w6.T)
    return shared, private, {}


def convert_torch_vit(state_dict: Dict[str, np.ndarray]):
    """torch ViT state_dict -> (shared, private, bn_state={}) in cpg_tpu
    naming (models/vit.py — no reference counterpart; this is the migration
    path for torch-pretrained ViTs onto the sharable transformer).

    Accepted layouts per block i:
      * separate projections: `blocks.{i}.{q,k,v,proj}.{weight,bias}` (the
        layout models/vit.py needs — separate q/k/v kernels are what makes
        head-growth embedding exact);
      * timm-style fused qkv: `blocks.{i}.attn.qkv.weight` (3*inner, D) is
        split row-wise into the three kernels (timm packs q|k|v on the out
        axis), `attn.proj.*` for the output projection, `norm1/norm2` for
        the LNs, `mlp.fc1/fc2`, `patch_embed.proj`.
    CLS-token checkpoints are not supported (models/vit.py mean-pools over
    patch tokens; a 3D (1, T, D) pos_embed is squeezed, nothing is dropped).
    """
    shared, private = {}, {}
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    for k, v in sd.items():
        parts = k.split(".")
        if parts[-1] not in ("weight", "bias"):
            if parts[0] in ("pos_embed", "pos"):
                if v.ndim == 3 and v.shape[0] == 1:
                    v = v[0]
                if v.ndim != 2:
                    raise ValueError(f"pos_embed shape {v.shape} unsupported")
                private["patch/pos_embed"] = v
                continue
            raise ValueError(f"unrecognized ViT param {k}")
        is_w = parts[-1] == "weight"
        if parts[0] in ("patch", "patch_embed"):
            if is_w:
                shared["patch/proj/kernel"] = np.transpose(v, (2, 3, 1, 0))
            else:
                # models/vit.py's patch conv is biasless; a per-channel conv
                # bias is constant across tokens, so it folds EXACTLY into
                # the (task-private) pos_embed added right after
                private["_patch_bias_fold"] = v
            continue
        if parts[0] == "blocks":
            i, name = int(parts[1]), ".".join(parts[2:-1])
            if name in ("ln1", "norm1", "ln2", "norm2"):
                ln = "ln1" if name in ("ln1", "norm1") else "ln2"
                private[f"blocks/{i}/{ln}/" +
                        ("scale" if is_w else "bias")] = v
            elif name == "attn.qkv":  # timm fused: split out-axis thirds
                third = v.shape[0] // 3
                for j, nm in enumerate(("q", "k", "v")):
                    chunk = v[j * third:(j + 1) * third]
                    if is_w:
                        shared[f"blocks/{i}/attn/{nm}/kernel"] = chunk.T
                    else:
                        private[f"blocks/{i}/attn/{nm}/bias"] = chunk
            elif name in ("q", "k", "v", "proj", "attn.q", "attn.k",
                          "attn.v", "attn.proj"):
                nm = name.split(".")[-1]
                if is_w:
                    shared[f"blocks/{i}/attn/{nm}/kernel"] = v.T
                else:
                    private[f"blocks/{i}/attn/{nm}/bias"] = v
            elif name in ("fc1", "fc2", "mlp.fc1", "mlp.fc2"):
                nm = name.split(".")[-1]
                if is_w:
                    shared[f"blocks/{i}/mlp/{nm}/kernel"] = v.T
                else:
                    private[f"blocks/{i}/mlp/{nm}/bias"] = v
            else:
                raise ValueError(f"unrecognized ViT block param {k}")
            continue
        if parts[0] == "norm":
            private["norm/" + ("scale" if is_w else "bias")] = v
            continue
        if parts[0] in ("head", "classifier"):
            if is_w:
                private["classifier/kernel"] = v.T
            else:
                private["classifier/bias"] = v
            continue
        if parts[0] in ("pos_embed", "pos"):
            if v.ndim == 3 and v.shape[0] == 1:
                v = v[0]
            private["patch/pos_embed"] = v
            continue
        raise ValueError(f"unrecognized ViT param {k}")
    fold = private.pop("_patch_bias_fold", None)
    if fold is not None:
        if "patch/pos_embed" not in private:
            raise ValueError("patch bias requires a pos_embed to fold into")
        private["patch/pos_embed"] = private["patch/pos_embed"] + fold
    return shared, private, {}


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


# ---------------------------------------------------------------------------
# Full CPG-checkpoint import: the reference's torch.save dict (backbone
# state_dict + pruner `masks` + per-dataset `shared_layer_info` + dataset
# history + width multiplier — ref:CPG_*_main*.py save_checkpoint, SURVEY §2
# "Checkpoints" row) -> a complete multi-task CPGState that predict()/
# TaskServer/run_sequence can use directly. Key names follow the reference
# layout as reconstructed in SURVEY (the mount is empty, so every lookup is
# tolerant and the format is pinned by the fixture round-trip test).
# ---------------------------------------------------------------------------


def _vgg16_module_maps(state_dict: Dict[str, np.ndarray]):
    """torch module name -> cpg_tpu layer base, for the VGG16-BN trunk.

    Returns (conv_map, bn_map): {'features.0': 'features/conv0', ...},
    {'features.1': 'features/bn0', ...} — order-based over the Sequential,
    mirroring convert_torch_vgg16_bn exactly."""
    conv_map, bn_map = {}, {}
    feats = {}
    for k, v in state_dict.items():
        parts = k.split(".")
        if parts[0] in ("features", "shared") and len(parts) >= 3:
            feats.setdefault(int(parts[1]),
                             {})[parts[-1]] = (k, np.asarray(v))
    ci = bi = 0
    for idx in sorted(feats):
        p = feats[idx]
        mod = None
        for leaf, (k, _) in p.items():
            mod = k.rsplit(".", 1)[0]
            break
        if "weight" in p and p["weight"][1].ndim == 4:
            conv_map[mod] = f"features/conv{ci}"
            ci += 1
        elif "running_mean" in p:
            bn_map[mod] = f"features/bn{bi}"
            bi += 1
    return conv_map, bn_map


def _lookup(d: Dict, *names, default=None):
    for n in names:
        if isinstance(d, dict) and n in d:
            return d[n]
    return default


def _as_np(v):
    return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)


def _mod_key(d: Dict, mod: str):
    """Fetch a per-module entry whether keyed 'features.0', 'features.0.weight'
    or with a 'module.' prefix."""
    for k in (mod, mod + ".weight", "module." + mod, "module." + mod + ".weight"):
        if k in d:
            return d[k]
    return None


def _t_conv(t):
    """torch OIHW -> HWIO (also applies to masks/piggymasks of the conv)."""
    return np.transpose(np.asarray(t), (2, 3, 1, 0))


def _t_fc5(t):
    """SphereNet fc5 (and its masks): torch (out, c*h*w) NCHW-flat ->
    (h*w*c, out) NHWC-flat (see convert_torch_spherenet20)."""
    from ..models.spherenet import _FLAT_HW

    t = np.asarray(t)
    h, w = _FLAT_HW
    c = t.shape[1] // (h * w)
    return (t.T.reshape(c, h, w, t.shape[0]).transpose(1, 2, 0, 3)
            .reshape(h * w * c, t.shape[0]))


def _vgg16_adapter(sd):
    conv_map, bn_map = _vgg16_module_maps(sd)
    return {
        "backbone": convert_torch_vgg16_bn(sd),
        "sharable": [(mod, f"{base}/kernel", _t_conv)
                     for mod, base in conv_map.items()],
        "bn_map": bn_map, "prelu_map": {}, "bias_map": {},
        "head": "classifier",
    }


def _resnet50_adapter(sd):
    sharable, bn_map = [], {}
    for k, v in sd.items():
        parts = k.split(".")
        if k.endswith(".weight") and np.asarray(v).ndim == 4:
            mod = k[:-len(".weight")]
            if parts[0] == "conv1":
                base = "conv1"
            elif parts[0].startswith("layer"):
                base = f"{parts[0]}/block{parts[1]}"
                base += ("/downsample" if parts[2] == "downsample"
                         else f"/{parts[2]}")
            else:
                continue
            sharable.append((mod, f"{base}/kernel", _t_conv))
        elif k.endswith(".running_mean"):
            mod = k[:-len(".running_mean")]
            if parts[0] == "bn1":
                bn_map[mod] = "bn1"
            elif parts[0].startswith("layer"):
                bn_map[mod] = (f"{parts[0]}/block{parts[1]}/"
                               + ("downsample_bn" if parts[2] == "downsample"
                                  else parts[2]))
    return {"backbone": convert_torch_resnet50(sd), "sharable": sharable,
            "bn_map": bn_map, "prelu_map": {}, "bias_map": {},
            "head": "classifier"}


def _sphere20_adapter(sd):
    from ..models.spherenet import STAGES

    sharable, prelu_map = [], {}
    for si, (_, units) in enumerate(STAGES):
        s = si + 1
        sharable.append((f"conv{s}_1", f"stage{s}/down/kernel", _t_conv))
        prelu_map[f"relu{s}_1"] = f"stage{s}/down_prelu/slope"
        for u in range(units):
            for half in (1, 2):
                j = 2 + 2 * u + (half - 1)
                sharable.append((f"conv{s}_{j}",
                                 f"stage{s}/unit{u}/conv{half}/kernel",
                                 _t_conv))
                prelu_map[f"relu{s}_{j}"] = \
                    f"stage{s}/unit{u}/prelu{half}/slope"
    sharable.append(("fc5", "fc5/kernel", _t_fc5))
    return {"backbone": convert_torch_spherenet20(sd), "sharable": sharable,
            "bn_map": {}, "prelu_map": prelu_map,
            "bias_map": {"fc5": "fc5/bias"}, "head": "classifier_angle"}


_CPG_ADAPTERS = {
    "vgg16_bn_cifar": _vgg16_adapter,
    "resnet50": _resnet50_adapter,
    "spherenet20": _sphere20_adapter,
}


def convert_torch_cpg_checkpoint(ckpt: Dict, arch: str = "vgg16_bn_cifar",
                                 threshold: float = 5e-3) -> CPGState:
    """Reference CPG checkpoint dict -> multi-task CPGState.

    Supports all three reference architectures (ref:CPG_cifar100_main_normal,
    ref:CPG_imagenet_main, ref:CPG_face_main save_checkpoint layouts):
    vgg16_bn_cifar, resnet50, spherenet20.

    Accepts the torch.load'ed dict with (tolerant names):
      - 'state_dict' | 'model_state_dict' | 'model': backbone weights; the
        BN affine/stats in it belong to the LAST (active) dataset
      - 'masks': {module: int tensor, same shape as the conv weight} —
        ownership, 0 = free, k = owned by task k (ref:pruner.py)
      - 'shared_layer_info': {dataset: {'piggymask': {module: t},
        'bn_layer_weight/bias/running_mean/running_var': {module: t},
        'bias': {module: t}, 'prelu_layer_weight': {module: t}}}
      - 'dataset_history': [name, ...] (task order); 'dataset2num_classes'
      - 'network_width_multiplier' | 'width_mult'
      - per-dataset heads: 'classifiers.{i}.weight/bias' in the state_dict,
        or 'classifier/kernel' falls back to the backbone's head (last task)

    Tasks are numbered 1..len(history) in history order (our ownership ints
    use the same convention, so `masks` passes through transposed). A task
    (>1) with no saved piggymask gets the reference init (all-above-threshold
    1e-2): it picks every prior weight, which is the reference's behavior
    before any mask training."""
    import jax

    from ..models import framework as fw, get_model

    if arch not in _CPG_ADAPTERS:
        raise NotImplementedError(
            f"full CPG-checkpoint import supports {sorted(_CPG_ADAPTERS)}; "
            f"got {arch!r}")

    sd = _lookup(ckpt, "state_dict", "model_state_dict", "model",
                 default=ckpt)
    sd = {(k[7:] if k.startswith("module.") else k): _as_np(v)
          for k, v in sd.items() if hasattr(v, "shape") or hasattr(v, "detach")}
    masks = {k: _as_np(v)
             for k, v in (_lookup(ckpt, "masks", "mask") or {}).items()}
    sli = _lookup(ckpt, "shared_layer_info", default={}) or {}
    history = list(_lookup(ckpt, "dataset_history", "datasets",
                           default=list(sli.keys())))
    if not history:
        raise ValueError("checkpoint lists no datasets "
                         "(dataset_history/shared_layer_info empty)")
    d2nc = _lookup(ckpt, "dataset2num_classes", default={}) or {}
    wm = float(_lookup(ckpt, "network_width_multiplier", "width_mult",
                       default=1.0))

    ad = _CPG_ADAPTERS[arch](sd)
    shared, last_private, last_bn = ad["backbone"]
    head = ad["head"]

    # ownership: reference mask ints ARE our convention (0 free, k task k)
    ownership = {}
    for mod, key, tr in ad["sharable"]:
        m = _mod_key(masks, mod)
        if m is None:
            ownership[key] = jnp.ones(shared[key].shape, jnp.int8)
        else:
            ownership[key] = jnp.asarray(tr(m), jnp.int8)

    state = CPGState(arch=arch, width_mult=wm,
                     shared={k: jnp.asarray(v, jnp.float32)
                             for k, v in shared.items()},
                     ownership=ownership, threshold=threshold)

    model_fn, in_shape = get_model(arch)
    emb = shared["fc5/kernel"].shape[1] if "fc5/kernel" in shared else None
    for i, ds in enumerate(history):
        tid = i + 1
        info = sli.get(ds, {})
        nc = int(_lookup(d2nc, ds, default=0) or 0)
        hw = _lookup(sd, f"classifiers.{i}.weight")
        hb = _lookup(sd, f"classifiers.{i}.bias")
        if hw is not None:  # orient: torch Linear is (out,in); AngleLinear
            hw = _as_np(hw)  # may already be (emb, out)
            hw = hw if (head == "classifier_angle"
                        and hw.shape[0] == emb) else hw.T
        if nc == 0 and hw is not None:
            nc = hw.shape[1]
        if nc == 0 and tid == len(history) \
                and f"{head}/kernel" in last_private:
            nc = last_private[f"{head}/kernel"].shape[1]
        if nc == 0:
            raise ValueError(f"cannot determine num_classes for {ds!r}")

        _, priv, bnst = fw.init(jax.random.PRNGKey(tid), model_fn,
                                jnp.zeros((1, *in_shape)), num_classes=nc,
                                mult=wm)
        # per-dataset BN affine/stats + PReLU slopes from shared_layer_info
        for src, dst, into in (
                ("bn_layer_weight", "scale", priv),
                ("bn_layer_bias", "bias", priv),
                ("bn_layer_running_mean", "mean", bnst),
                ("bn_layer_running_var", "var", bnst)):
            for mod, ours in ad["bn_map"].items():
                v = _mod_key(_lookup(info, src, default={}) or {}, mod)
                if v is not None:
                    into[f"{ours}/{dst}"] = jnp.asarray(_as_np(v))
        prelus = _lookup(info, "prelu_layer_weight", "prelu", default={}) or {}
        for mod, ours in ad["prelu_map"].items():
            v = _mod_key(prelus, mod)
            if v is not None:
                priv[ours] = jnp.asarray(_as_np(v))
        biases = _lookup(info, "bias", "biases", default={}) or {}
        for mod, ours in ad["bias_map"].items():
            v = _mod_key(biases, mod)
            if v is not None:
                priv[ours] = jnp.asarray(_as_np(v))
        if tid == len(history):  # backbone private entries = active task's
            for k, v in last_private.items():
                if not k.startswith(head):
                    priv[k] = jnp.asarray(v)
            for k, v in last_bn.items():
                bnst[k] = jnp.asarray(v)
        # head
        if hw is not None:
            priv[f"{head}/kernel"] = jnp.asarray(hw)
            if hb is not None and head == "classifier":
                priv[f"{head}/bias"] = jnp.asarray(_as_np(hb))
        elif tid == len(history) and f"{head}/kernel" in last_private:
            priv[f"{head}/kernel"] = jnp.asarray(
                last_private[f"{head}/kernel"])
            if f"{head}/bias" in last_private:
                priv[f"{head}/bias"] = jnp.asarray(
                    last_private[f"{head}/bias"])

        # piggymask (tasks > 1); missing -> reference init (pick everything)
        pm = None
        if tid > 1:
            pm = {}
            pmsrc = _lookup(info, "piggymask", "piggymasks", default={}) or {}
            for mod, key, tr in ad["sharable"]:
                v = _mod_key(pmsrc, mod)
                if v is not None:
                    pm[key] = jnp.asarray(tr(v), jnp.float32)
                else:
                    pm[key] = jnp.full(state.shared[key].shape, 1e-2,
                                       jnp.float32)
        state.tasks[tid] = TaskEntry(
            name=str(ds), num_classes=nc, piggymask=pm, private=priv,
            bn_state=bnst,
            meta={"imported": "torch_cpg_checkpoint"})
    return state
