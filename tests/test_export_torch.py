"""train/export_torch: CPGState -> reference torch.save layout.

Two proof obligations:
  1. export -> import round-trips bit-exact per architecture (the dict is a
     faithful inverse of convert_torch_cpg_checkpoint).
  2. a GENUINE torch model consumes the export: reference inference
     semantics (apply_mask visibility + Binarizer picking + per-dataset
     shared_layer_info overlays, ref:CPG_*_main*.py --mode inference) are
     re-implemented in numpy/torch from the exported dict alone, and the
     torch forward matches our predict() — so a reference user can actually
     evaluate checkpoints exported by this stack.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from cpg_tpu.inference import predict
from cpg_tpu.train.export_torch import export_torch_cpg_checkpoint
from cpg_tpu.train.pretrained import convert_torch_cpg_checkpoint

from .test_import_cpg import _our_state, _resnet_state, _sphere_state
from .test_torch_parity import TorchVGG16BN


def _round_trip(state, arch, in_hw):
    got = convert_torch_cpg_checkpoint(export_torch_cpg_checkpoint(state),
                                       arch=arch)
    for k in state.ownership:
        np.testing.assert_array_equal(np.asarray(got.ownership[k]),
                                      np.asarray(state.ownership[k]), k)
    x = jax.random.normal(jax.random.PRNGKey(11), (2, *in_hw, 3), jnp.float32)
    for tid in state.task_ids():
        want = np.asarray(predict(state, tid, x, compute_dtype=jnp.float32))
        have = np.asarray(predict(got, tid, x, compute_dtype=jnp.float32))
        np.testing.assert_array_equal(have, want,
                                      err_msg=f"task {tid} logits drifted")


def test_export_import_round_trip_vgg():
    _round_trip(_our_state(), "vgg16_bn_cifar", (32, 32))


def test_export_import_round_trip_resnet50():
    _round_trip(_resnet_state(), "resnet50", (224, 224))


def test_export_import_round_trip_spherenet20():
    _round_trip(_sphere_state(), "spherenet20", (112, 96))


def test_export_consumed_by_genuine_torch():
    """Reference-style inference directly off the exported dict: compute the
    task's effective weights with the reference rule (own==t unmasked;
    0<own<t picked where piggymask > threshold; else zero), overlay the
    task's shared_layer_info BN and head, and run the real TorchVGG16BN."""
    state = _our_state()
    ckpt = export_torch_cpg_checkpoint(state)
    sd, masks, sli = ckpt["state_dict"], ckpt["masks"], ckpt["shared_layer_info"]
    thr = state.threshold

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(5), (4, 32, 32, 3),
                                     jnp.float32))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)).copy())  # NHWC->NCHW

    for tid in state.task_ids():
        t = state.tasks[tid]
        tm = TorchVGG16BN(num_classes=t.num_classes).eval()
        info = sli[t.name]
        with torch.no_grad():
            for mod, own in masks.items():
                w = sd[f"{mod}.weight"].copy()
                own = np.asarray(own)
                pm = info.get("piggymask", {}).get(mod)
                picked = (np.asarray(pm) > thr) if pm is not None else False
                keep = (own == tid) | ((own > 0) & (own < tid) & picked)
                w[~keep] = 0.0
                dict(tm.named_modules())[mod].weight.copy_(
                    torch.from_numpy(w))
            for mod in info["bn_layer_weight"]:
                bn = dict(tm.named_modules())[mod]
                bn.weight.copy_(torch.from_numpy(
                    info["bn_layer_weight"][mod]))
                bn.bias.copy_(torch.from_numpy(info["bn_layer_bias"][mod]))
                bn.running_mean.copy_(torch.from_numpy(
                    info["bn_layer_running_mean"][mod]))
                bn.running_var.copy_(torch.from_numpy(
                    info["bn_layer_running_var"][mod]))
            tm.classifier.weight.copy_(torch.from_numpy(
                sd[f"classifiers.{tid - 1}.weight"]))
            tm.classifier.bias.copy_(torch.from_numpy(
                sd[f"classifiers.{tid - 1}.bias"]))
            got = tm(xt).numpy()
        want = np.asarray(predict(state, tid, x, compute_dtype=jnp.float32))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4,
                                   err_msg=f"task {tid}")
