from .distributed import global_batch_array, initialize, process_batch_slice
from .fsdp import FSDP, fsdp_spec
from .mesh import DataParallel, make_mesh
from .pipeline import (PipelineParallel, pipeline_apply, pipeline_stages,
                       resnet_stage_fns, stack_layer_params)
from .tensor import TensorParallel, resnet_tp_rules

__all__ = ["DataParallel", "make_mesh", "initialize",
           "process_batch_slice", "global_batch_array",
           "TensorParallel", "resnet_tp_rules", "FSDP", "fsdp_spec",
           "PipelineParallel", "pipeline_apply", "pipeline_stages",
           "resnet_stage_fns", "stack_layer_params"]
