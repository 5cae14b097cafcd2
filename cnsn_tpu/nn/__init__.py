from .norm import (BatchNorm, BatchNorm1dStats, InstanceNorm, IBN,
                   MultiBatchNorm, gelu_sig)
from .cnsn import CrossNorm, SelfNorm, CNSN

__all__ = [
    "BatchNorm", "BatchNorm1dStats", "InstanceNorm", "IBN",
    "MultiBatchNorm", "gelu_sig",
    "CrossNorm", "SelfNorm", "CNSN",
]
