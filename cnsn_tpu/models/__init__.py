"""Model zoo registry.

Same constructor surface as the reference drivers (cifar.py:377-390,
imagenet.py:506-521): build by name with the CN/SN knob set
(pos, crop, beta, cnsn_type) plus the TPU-specific ``num_groups``
(data-parallel pairing groups for CrossNorm).
"""
from __future__ import annotations

from typing import Any

from .allconv import AllConvNet
from .densenet import DenseNet, densenet
from .resnet import ResNet, resnet50
from .resnet_ibn import ResNetIBN, resnet50_ibn_a, resnet50_ibn_b
from .resnext import CifarResNeXt, resnext29
from .wideresnet import WideResNet

__all__ = [
    "AllConvNet", "DenseNet", "densenet", "ResNet", "resnet50",
    "ResNetIBN", "resnet50_ibn_a", "resnet50_ibn_b",
    "CifarResNeXt", "resnext29", "WideResNet", "build_model",
]

_CIFAR_KNOBS = ("pos", "crop", "beta", "cnsn_type", "num_groups")


def build_model(name: str, num_classes: int, **knobs: Any):
    """Build a model by reference-script name.

    knobs: pos, crop, beta, cnsn_type, num_groups (active_num is a
    train-step knob here, not a model attribute — the active-site mask
    is sampled by the train step and passed in).
    """
    knobs = {k: v for k, v in knobs.items() if v is not None}
    if name == "wideresnet":
        return WideResNet(depth=40, widen_factor=2, drop_rate=0.0,
                          num_classes=num_classes, **knobs)
    if name == "allconv":
        if "pos" in knobs:
            knobs["pos"] = int(knobs["pos"])
        return AllConvNet(num_classes=num_classes, **knobs)
    if name == "densenet":
        return densenet(num_classes=num_classes, **knobs)
    if name == "resnext":
        return resnext29(num_classes=num_classes, **knobs)
    if name == "resnet50":
        return resnet50(num_classes=num_classes, **knobs)
    if name == "resnet50_ibn_a":
        return resnet50_ibn_a(num_classes=num_classes, **knobs)
    if name == "resnet50_ibn_b":
        return resnet50_ibn_b(num_classes=num_classes, **knobs)
    raise ValueError(f"unknown model: {name}")
