import jax

from .ins_stats import ins_stats_pallas, instance_mean_std_fast
from .selfnorm import (selfnorm_fits_vmem, selfnorm_infer_pallas,
                       selfnorm_infer_reference)

__all__ = [
    "ins_stats_pallas", "instance_mean_std_fast",
    "selfnorm_fits_vmem", "selfnorm_infer_pallas",
    "selfnorm_infer_reference", "pallas_dispatch",
]


def pallas_dispatch():
    """Platform policy for the opt-in Pallas stats kernels, in one
    place: ``(use, interpret)`` — run compiled on tpu/axon, run in
    interpret mode on cpu (the test seam), skip elsewhere."""
    backend = jax.default_backend()
    interp = backend == "cpu"
    return backend in ("tpu", "axon") or interp, interp
