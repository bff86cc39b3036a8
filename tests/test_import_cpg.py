"""Full reference-CPG-checkpoint import (train/pretrained.py
convert_torch_cpg_checkpoint): a torch.save-layout dict (backbone state_dict
+ pruner masks + per-dataset shared_layer_info + history) must reconstruct a
CPGState whose per-task predictions are BIT-exact vs the state that produced
the fixture. The fixture uses genuine torch module naming (TorchVGG16BN) so
the module maps are pinned against real Sequential indices, not invented
keys."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cpg_tpu.core.pruner import one_shot_prune
from cpg_tpu.inference import predict
from cpg_tpu.train.pretrained import convert_torch_cpg_checkpoint
from cpg_tpu.train.sequence import init_state, start_task


def _our_state():
    """Two-task VGG16 state with non-trivial ownership and piggymasks."""
    state = init_state("vgg16_bn_cifar", jax.random.PRNGKey(0))
    start_task(state, "aquatic_mammals", 5, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "fish", 3, jax.random.PRNGKey(2))
    # scribble the piggymask so import isn't just reproducing the init
    t2 = state.tasks[2]
    t2.piggymask = {
        k: jax.random.uniform(jax.random.PRNGKey(i), v.shape,
                              jnp.float32, 0.0, 2e-2)
        for i, (k, v) in enumerate(sorted(t2.piggymask.items()))}
    # distinct BN stats per task so the per-dataset overlays are observable
    for tid in (1, 2):
        t = state.tasks[tid]
        t.bn_state = {k: v + 0.01 * tid for k, v in t.bn_state.items()}
    return state


def _torch_fixture(state):
    """Inverse-map `state` into the reference checkpoint layout with genuine
    torch VGG16-BN naming."""
    torch = pytest.importorskip("torch")
    from .test_torch_parity import TorchVGG16BN

    tm = TorchVGG16BN(num_classes=3)
    sd = {k: v.detach().cpu().numpy().copy()
          for k, v in tm.state_dict().items()}
    # module-name maps in Sequential order
    conv_mods = [k.rsplit(".", 1)[0] for k, v in sd.items()
                 if k.startswith("features.") and v.ndim == 4]
    bn_mods = sorted({k.rsplit(".", 1)[0] for k in sd
                      if k.startswith("features.")
                      and k.endswith("running_mean")},
                     key=lambda m: int(m.split(".")[1]))

    def inv_conv(t):  # HWIO -> OIHW
        return np.transpose(np.asarray(t), (3, 2, 0, 1))

    for i, mod in enumerate(conv_mods):
        sd[f"{mod}.weight"] = inv_conv(state.shared[
            f"features/conv{i}/kernel"])
    masks = {mod: inv_conv(state.ownership[f"features/conv{i}/kernel"])
             for i, mod in enumerate(conv_mods)}

    history = [state.tasks[tid].name for tid in state.task_ids()]
    sli = {}
    for tid in state.task_ids():
        t = state.tasks[tid]
        info = {"bn_layer_weight": {}, "bn_layer_bias": {},
                "bn_layer_running_mean": {}, "bn_layer_running_var": {}}
        for j, mod in enumerate(bn_mods):
            info["bn_layer_weight"][mod] = np.asarray(
                t.private[f"features/bn{j}/scale"])
            info["bn_layer_bias"][mod] = np.asarray(
                t.private[f"features/bn{j}/bias"])
            info["bn_layer_running_mean"][mod] = np.asarray(
                t.bn_state[f"features/bn{j}/mean"])
            info["bn_layer_running_var"][mod] = np.asarray(
                t.bn_state[f"features/bn{j}/var"])
        if t.piggymask is not None:
            info["piggymask"] = {
                mod: inv_conv(t.piggymask[f"features/conv{i}/kernel"])
                for i, mod in enumerate(conv_mods)}
        sli[t.name] = info
        # per-dataset heads live as classifiers.{i}.* in the state_dict
        sd[f"classifiers.{tid - 1}.weight"] = np.asarray(
            t.private["classifier/kernel"]).T
        sd[f"classifiers.{tid - 1}.bias"] = np.asarray(
            t.private["classifier/bias"])
    # backbone BN entries carry the ACTIVE (last) task's values
    last = state.tasks[state.task_ids()[-1]]
    for j, mod in enumerate(bn_mods):
        sd[f"{mod}.weight"] = np.asarray(last.private[f"features/bn{j}/scale"])
        sd[f"{mod}.bias"] = np.asarray(last.private[f"features/bn{j}/bias"])
        sd[f"{mod}.running_mean"] = np.asarray(
            last.bn_state[f"features/bn{j}/mean"])
        sd[f"{mod}.running_var"] = np.asarray(
            last.bn_state[f"features/bn{j}/var"])

    return {
        "state_dict": sd,
        "masks": masks,
        "shared_layer_info": sli,
        "dataset_history": history,
        "dataset2num_classes": {t.name: t.num_classes
                                for t in state.tasks.values()},
        "network_width_multiplier": state.width_mult,
    }


def test_import_round_trip_bit_exact():
    state = _our_state()
    ckpt = _torch_fixture(state)
    got = convert_torch_cpg_checkpoint(ckpt)

    assert got.width_mult == state.width_mult
    assert got.num_tasks == 2
    assert got.tasks[1].name == "aquatic_mammals"
    assert got.tasks[1].piggymask is None
    for k in state.ownership:
        np.testing.assert_array_equal(np.asarray(got.ownership[k]),
                                      np.asarray(state.ownership[k]), k)
    for k in state.tasks[2].piggymask:
        np.testing.assert_array_equal(
            np.asarray(got.tasks[2].piggymask[k]),
            np.asarray(state.tasks[2].piggymask[k]), k)

    x = jax.random.normal(jax.random.PRNGKey(7), (4, 32, 32, 3), jnp.float32)
    for tid in (1, 2):
        want = np.asarray(predict(state, tid, x, compute_dtype=jnp.float32))
        have = np.asarray(predict(got, tid, x, compute_dtype=jnp.float32))
        np.testing.assert_array_equal(have, want,
                                      err_msg=f"task {tid} logits drifted")


def _rn_mod(key):
    """'layer1/block0/conv2/kernel'-style shared key -> torch module name."""
    parts = key.split("/")
    if parts[0] == "conv1":
        return "conv1"
    layer, block = parts[0], parts[1][len("block"):]
    if parts[2] == "downsample":
        return f"{layer}.{block}.downsample.0"
    return f"{layer}.{block}.{parts[2]}"


def _rn_bnmod(base):
    """'layer1/block0/bn1'-style private BN base -> torch module name."""
    parts = base.split("/")
    if parts[0] == "bn1":
        return "bn1"
    layer, block = parts[0], parts[1][len("block"):]
    if parts[2] == "downsample_bn":
        return f"{layer}.{block}.downsample.1"
    return f"{layer}.{block}.{parts[2]}"


def _resnet_state():
    state = init_state("resnet50", jax.random.PRNGKey(0))
    start_task(state, "cubs", 5, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "stanford_cars", 3, jax.random.PRNGKey(2))
    t2 = state.tasks[2]
    t2.piggymask = {
        k: jax.random.uniform(jax.random.PRNGKey(i), v.shape,
                              jnp.float32, 0.0, 2e-2)
        for i, (k, v) in enumerate(sorted(t2.piggymask.items()))}
    for tid in (1, 2):
        t = state.tasks[tid]
        t.bn_state = {k: v + 0.01 * tid for k, v in t.bn_state.items()}
    return state


def _resnet_fixture(state):
    """Inverse-map into the ref:CPG_imagenet_main.py checkpoint layout."""
    def inv(t):  # HWIO -> OIHW
        return np.transpose(np.asarray(t), (3, 2, 0, 1))

    sd, masks = {}, {}
    for k, v in state.shared.items():
        mod = _rn_mod(k)
        sd[f"{mod}.weight"] = inv(v)
        masks[mod] = inv(state.ownership[k])

    bn_bases = sorted(k[:-len("/scale")] for k in state.tasks[1].private
                      if k.endswith("/scale"))
    history = [state.tasks[tid].name for tid in state.task_ids()]
    sli = {}
    for tid in state.task_ids():
        t = state.tasks[tid]
        info = {"bn_layer_weight": {}, "bn_layer_bias": {},
                "bn_layer_running_mean": {}, "bn_layer_running_var": {}}
        for base in bn_bases:
            mod = _rn_bnmod(base)
            info["bn_layer_weight"][mod] = np.asarray(t.private[f"{base}/scale"])
            info["bn_layer_bias"][mod] = np.asarray(t.private[f"{base}/bias"])
            info["bn_layer_running_mean"][mod] = np.asarray(
                t.bn_state[f"{base}/mean"])
            info["bn_layer_running_var"][mod] = np.asarray(
                t.bn_state[f"{base}/var"])
        if t.piggymask is not None:
            info["piggymask"] = {_rn_mod(k): inv(v)
                                 for k, v in t.piggymask.items()}
        sli[t.name] = info
        sd[f"classifiers.{tid - 1}.weight"] = np.asarray(
            t.private["classifier/kernel"]).T
        sd[f"classifiers.{tid - 1}.bias"] = np.asarray(
            t.private["classifier/bias"])
    last = state.tasks[state.task_ids()[-1]]
    for base in bn_bases:
        mod = _rn_bnmod(base)
        sd[f"{mod}.weight"] = np.asarray(last.private[f"{base}/scale"])
        sd[f"{mod}.bias"] = np.asarray(last.private[f"{base}/bias"])
        sd[f"{mod}.running_mean"] = np.asarray(last.bn_state[f"{base}/mean"])
        sd[f"{mod}.running_var"] = np.asarray(last.bn_state[f"{base}/var"])
    return {"state_dict": sd, "masks": masks, "shared_layer_info": sli,
            "dataset_history": history,
            "dataset2num_classes": {t.name: t.num_classes
                                    for t in state.tasks.values()},
            "network_width_multiplier": state.width_mult}


def test_import_round_trip_resnet50():
    state = _resnet_state()
    got = convert_torch_cpg_checkpoint(_resnet_fixture(state), arch="resnet50")
    assert got.num_tasks == 2 and got.tasks[2].name == "stanford_cars"
    for k in state.ownership:
        np.testing.assert_array_equal(np.asarray(got.ownership[k]),
                                      np.asarray(state.ownership[k]), k)
    for k in state.tasks[2].piggymask:
        np.testing.assert_array_equal(
            np.asarray(got.tasks[2].piggymask[k]),
            np.asarray(state.tasks[2].piggymask[k]), k)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 224, 224, 3),
                          jnp.float32)
    for tid in (1, 2):
        want = np.asarray(predict(state, tid, x, compute_dtype=jnp.float32))
        have = np.asarray(predict(got, tid, x, compute_dtype=jnp.float32))
        np.testing.assert_array_equal(have, want,
                                      err_msg=f"task {tid} logits drifted")


def _sph_mod(key):
    """'stage2/unit1/conv2/kernel'-style shared key -> torch module name."""
    parts = key.split("/")
    if parts[0] == "fc5":
        return "fc5"
    s = parts[0][len("stage"):]
    if parts[1] == "down":
        return f"conv{s}_1"
    u, half = int(parts[1][len("unit"):]), int(parts[2][len("conv"):])
    return f"conv{s}_{2 + 2 * u + (half - 1)}"


def _sph_inv(key, v):
    """Inverse of the import transforms (conv HWIO->OIHW; fc5 NHWC-flat ->
    torch (out, c*h*w) NCHW-flat)."""
    from cpg_tpu.models.spherenet import _FLAT_HW

    v = np.asarray(v)
    if key != "fc5/kernel":
        return np.transpose(v, (3, 2, 0, 1))
    h, w = _FLAT_HW
    c = v.shape[0] // (h * w)
    return (v.reshape(h, w, c, v.shape[1]).transpose(2, 0, 1, 3)
            .reshape(c * h * w, v.shape[1]).T)


def _sphere_state():
    state = init_state("spherenet20", jax.random.PRNGKey(0))
    start_task(state, "face_verification", 5, jax.random.PRNGKey(1))
    state.shared, state.ownership = one_shot_prune(
        state.shared, state.ownership, 1, jnp.float32(0.5))
    start_task(state, "emotion", 3, jax.random.PRNGKey(2))
    t2 = state.tasks[2]
    t2.piggymask = {
        k: jax.random.uniform(jax.random.PRNGKey(i), v.shape,
                              jnp.float32, 0.0, 2e-2)
        for i, (k, v) in enumerate(sorted(t2.piggymask.items()))}
    return state


def _sphere_fixture(state):
    """Inverse-map into the ref:CPG_face_main.py checkpoint layout (PReLU
    slopes + fc5 bias per-dataset; AngleLinear head stored (in, out))."""
    def slope_mod(slope_key):
        # prelu module for convS_J is reluS_J; our slope key -> torch module
        if slope_key.endswith("down_prelu/slope"):
            s = slope_key.split("/")[0][len("stage"):]
            return f"relu{s}_1"
        parts = slope_key.split("/")  # stageS/unitU/preluH/slope
        s = parts[0][len("stage"):]
        u, half = int(parts[1][len("unit"):]), int(parts[2][len("prelu"):])
        return f"relu{s}_{2 + 2 * u + (half - 1)}"

    sd, masks = {}, {}
    for k, v in state.shared.items():
        sd[f"{_sph_mod(k)}.weight"] = _sph_inv(k, v)
        masks[_sph_mod(k)] = _sph_inv(k, state.ownership[k])

    history = [state.tasks[tid].name for tid in state.task_ids()]
    sli = {}
    for tid in state.task_ids():
        t = state.tasks[tid]
        info = {"prelu_layer_weight": {}, "bias": {}}
        for k in t.private:
            if k.endswith("/slope"):
                info["prelu_layer_weight"][slope_mod(k)] = np.asarray(
                    t.private[k])
        info["bias"]["fc5"] = np.asarray(t.private["fc5/bias"])
        if t.piggymask is not None:
            info["piggymask"] = {_sph_mod(k): _sph_inv(k, v)
                                 for k, v in t.piggymask.items()}
        sli[t.name] = info
        # AngleLinear weight is (in_features, out_features) in the reference
        sd[f"classifiers.{tid - 1}.weight"] = np.asarray(
            t.private["classifier_angle/kernel"])
    last = state.tasks[state.task_ids()[-1]]
    for k in last.private:
        if k.endswith("/slope"):
            sd[f"{slope_mod(k)}.weight"] = np.asarray(last.private[k])
    sd["fc5.bias"] = np.asarray(last.private["fc5/bias"])
    sd["fc6.weight"] = np.asarray(last.private["classifier_angle/kernel"])
    return {"state_dict": sd, "masks": masks, "shared_layer_info": sli,
            "dataset_history": history,
            "dataset2num_classes": {t.name: t.num_classes
                                    for t in state.tasks.values()},
            "network_width_multiplier": state.width_mult}


def test_import_round_trip_spherenet20():
    state = _sphere_state()
    got = convert_torch_cpg_checkpoint(_sphere_fixture(state),
                                       arch="spherenet20")
    assert got.num_tasks == 2
    for k in state.ownership:
        np.testing.assert_array_equal(np.asarray(got.ownership[k]),
                                      np.asarray(state.ownership[k]), k)
    for k in state.tasks[2].piggymask:
        np.testing.assert_array_equal(
            np.asarray(got.tasks[2].piggymask[k]),
            np.asarray(state.tasks[2].piggymask[k]), k)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 112, 96, 3), jnp.float32)
    for tid in (1, 2):
        want = np.asarray(predict(state, tid, x, compute_dtype=jnp.float32))
        have = np.asarray(predict(got, tid, x, compute_dtype=jnp.float32))
        np.testing.assert_array_equal(have, want,
                                      err_msg=f"task {tid} logits drifted")


def test_import_missing_piggymask_gets_reference_init():
    state = _our_state()
    ckpt = _torch_fixture(state)
    for info in ckpt["shared_layer_info"].values():
        info.pop("piggymask", None)
    got = convert_torch_cpg_checkpoint(ckpt)
    pm = got.tasks[2].piggymask
    assert pm is not None
    for k, v in pm.items():
        np.testing.assert_allclose(np.asarray(v), 1e-2, err_msg=k)
