from .io import image_to_tensor, save_gif_from_tensors, tensor_to_images
from .profiling import profiled_function, named_scope
from .misc import (constant, nan_to_num, assert_shape, InfiniteSampler,
                   params_count, print_module_summary,
                   check_replica_consistency)
from .training_stats import Collector, moments

__all__ = ["image_to_tensor", "save_gif_from_tensors", "tensor_to_images",
           "profiled_function", "named_scope",
           "constant", "nan_to_num", "assert_shape", "InfiniteSampler",
           "params_count", "print_module_summary",
           "check_replica_consistency",
           "Collector", "moments"]
