"""Model zoo registry (ref:models/__init__.py keyed by --arch)."""

from __future__ import annotations

from typing import Callable, Dict

from .resnet import resnet50
from .spherenet import spherenet20
from .vgg import vgg16_bn_cifar

# arch name -> (model_fn, default input shape HWC)
REGISTRY: Dict[str, tuple] = {
    "vgg16_bn_cifar": (vgg16_bn_cifar, (32, 32, 3)),
    "resnet50": (resnet50, (224, 224, 3)),
    "spherenet20": (spherenet20, (112, 96, 3)),
}


def register(name: str, fn: Callable, input_shape):
    REGISTRY[name] = (fn, tuple(input_shape))


def get_model(name: str):
    if name not in REGISTRY:
        raise KeyError(f"unknown arch {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name]
