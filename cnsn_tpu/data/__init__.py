from .augmix import AUGMENTATIONS, AUGMENTATIONS_ALL, augmix
from .cifar import (CORRUPTIONS, CifarData, CifarLoader, load_cifar,
                    load_cifar_c)
from .transforms import (cifar_eval_transform, cifar_train_transform,
                         imagenet_normalize, normalize)

__all__ = [
    "AUGMENTATIONS", "AUGMENTATIONS_ALL", "augmix",
    "CORRUPTIONS", "CifarData", "CifarLoader", "load_cifar", "load_cifar_c",
    "cifar_eval_transform", "cifar_train_transform", "imagenet_normalize",
    "normalize",
]
