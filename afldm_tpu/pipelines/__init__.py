from .ldm import LDMPipeline
from .i2sb import I2SBLDMPipeline
from .shift_eval import shift_equivariance_eval, ShiftEvalResult

__all__ = ["LDMPipeline", "I2SBLDMPipeline", "shift_equivariance_eval",
           "ShiftEvalResult"]
