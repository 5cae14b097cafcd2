from .stats import instance_mean_std, masked_instance_mean_std, region_mask
from .bbox import sample_bbox
from .crossnorm import cross_norm_2ins, instance_norm_mix, grouped_permutation

__all__ = [
    "instance_mean_std",
    "masked_instance_mean_std",
    "region_mask",
    "sample_bbox",
    "cross_norm_2ins",
    "instance_norm_mix",
    "grouped_permutation",
]
