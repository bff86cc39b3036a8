"""Model zoo registry (ref:models/__init__.py keyed by --arch)."""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

from .resnet import resnet50
from .spherenet import spherenet20, spherenet_flatten_dims
from .vgg import vgg16_bn_cifar
from .moe import vit_moe_cifar
from .text import textcls
from .vit import vit_b16, vit_cifar

# arch name -> (model_fn, default input shape HWC; (T,) = token sequence)
REGISTRY: Dict[str, tuple] = {
    "vgg16_bn_cifar": (vgg16_bn_cifar, (32, 32, 3)),
    "resnet50": (resnet50, (224, 224, 3)),
    "spherenet20": (spherenet20, (112, 96, 3)),
    # beyond-reference: transformer families (models/vit.py growth law)
    "vit_cifar": (vit_cifar, (32, 32, 3)),
    "vit_b16": (vit_b16, (224, 224, 3)),
    "vit_moe_cifar": (vit_moe_cifar, (32, 32, 3)),
    "textcls": (textcls, (64,)),
}

# arch name -> {layer: (H, W)} for dense kernels fed by a spatial flatten.
# Growth must block-permute those kernels' input axes (core/grow.py), or
# old-task activations land on the wrong rows and bit-exactness breaks.
# VGG (1x1 after 5 pools) and ResNet-50 (global avg pool) flatten trivially.
FLATTEN_DIMS: Dict[str, Dict[str, Tuple[int, int]]] = {
    "spherenet20": spherenet_flatten_dims(),
}


def register(name: str, fn: Callable, input_shape, flatten_dims=None):
    REGISTRY[name] = (fn, tuple(input_shape))
    if flatten_dims:
        FLATTEN_DIMS[name] = dict(flatten_dims)


def get_model(name: str):
    if name not in REGISTRY:
        raise KeyError(f"unknown arch {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name]


def get_flatten_dims(name: str) -> Optional[Dict[str, Tuple[int, int]]]:
    """flatten_dims for grow_state, or None for plain block embedding."""
    return FLATTEN_DIMS.get(name)
