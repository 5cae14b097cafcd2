from .distributed import global_batch_array, initialize, process_batch_slice
from .mesh import DataParallel, make_mesh

__all__ = ["DataParallel", "make_mesh", "initialize",
           "process_batch_slice", "global_batch_array"]
