from .ins_stats import ins_stats_pallas, instance_mean_std_fast
from .selfnorm import (selfnorm_fits_vmem, selfnorm_infer_pallas,
                       selfnorm_infer_reference)

__all__ = [
    "ins_stats_pallas", "instance_mean_std_fast",
    "selfnorm_fits_vmem", "selfnorm_infer_pallas",
    "selfnorm_infer_reference",
]
