"""cnsn_tpu — TPU-native CrossNorm/SelfNorm framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of
amazon-science/crossnorm-selfnorm (ICCV 2021, arXiv:2102.02811),
designed TPU-first: NHWC layouts, functional RNG-threaded CrossNorm,
static-shape masked-statistics crops, Pallas fused stat kernels, and
data parallelism via jax.sharding meshes instead of DataParallel/DDP.
"""

__version__ = "0.1.0"

from . import ops  # noqa: F401
from .config import ExperimentConfig, load_config  # noqa: F401
from .models import build_model  # noqa: F401
