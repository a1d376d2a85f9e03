from .ldm import LDMPipeline
from .i2sb import I2SBLDMPipeline
from .shift_eval import shift_equivariance_eval, ShiftEvalResult
from .normal_control import NormControlPipeline, NormalEstimationResult
from .video_editing import VideoEquivEditingPipeline
from .interpolation import ImageInterpolationPipeline, slerp

__all__ = ["LDMPipeline", "I2SBLDMPipeline", "shift_equivariance_eval",
           "ShiftEvalResult", "NormControlPipeline",
           "NormalEstimationResult", "VideoEquivEditingPipeline",
           "ImageInterpolationPipeline", "slerp"]
