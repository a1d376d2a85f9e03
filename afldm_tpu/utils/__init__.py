from .io import image_to_tensor, save_gif_from_tensors, tensor_to_images
from .profiling import profiled_function, named_scope

__all__ = ["image_to_tensor", "save_gif_from_tensors", "tensor_to_images",
           "profiled_function", "named_scope"]
