"""Model zoo registry (ref:models/__init__.py keyed by --arch)."""

from __future__ import annotations

from typing import Callable, Dict

from .vgg import vgg16_bn_cifar

# arch name -> (model_fn, default input shape HWC)
REGISTRY: Dict[str, tuple] = {
    "vgg16_bn_cifar": (vgg16_bn_cifar, (32, 32, 3)),
}


def register(name: str, fn: Callable, input_shape):
    REGISTRY[name] = (fn, tuple(input_shape))


def get_model(name: str):
    if name not in REGISTRY:
        raise KeyError(f"unknown arch {name!r}; have {sorted(REGISTRY)}")
    return REGISTRY[name]
