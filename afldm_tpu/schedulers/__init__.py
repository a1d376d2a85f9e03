from .ddpm import DDPMScheduler
from .ddim import DDIMScheduler
from .i2sb import I2SBScheduler
from .common import make_betas, rescale_zero_terminal_snr, betas_for_alpha_bar

__all__ = [
    "DDPMScheduler",
    "DDIMScheduler",
    "I2SBScheduler",
    "make_betas",
    "rescale_zero_terminal_snr",
    "betas_for_alpha_bar",
]
