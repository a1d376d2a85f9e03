from .ideal_lpf import (
    create_lpf_rect,
    create_fixed_lpf_rect,
    create_recon_rect,
    lpf_rfft,
    lpf_recon_rfft,
    upsample_rfft,
    downsample_rfft,
    subpixel_shift,
    filtered_nonlinearity,
)
from .bias_act import (bias_act, activation_funcs, fma,
                       filtered_lrelu)
from .attention import (sdpa, sdpa_flash, sdpa_xla, set_attention_impl)
from .upfirdn2d import (
    conv2d_resample,
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
    setup_filter,
)

__all__ = [
    "create_lpf_rect",
    "create_fixed_lpf_rect",
    "create_recon_rect",
    "lpf_rfft",
    "lpf_recon_rfft",
    "upsample_rfft",
    "downsample_rfft",
    "subpixel_shift",
    "filtered_nonlinearity",
    "bias_act",
    "sdpa",
    "sdpa_flash",
    "sdpa_xla",
    "set_attention_impl",
    "fma",
    "filtered_lrelu",
    "conv2d_resample",
    "activation_funcs",
    "upfirdn2d",
    "filter2d",
    "upsample2d",
    "downsample2d",
    "setup_filter",
]
