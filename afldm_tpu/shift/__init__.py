from .metrics import mask_mse, mask_psnr, psnr
from .shifters import (
    FILTER_CHOICES,
    BgType,
    ImageShifter,
    gen_valid_mask,
    gen_random_offset,
    fourier_shift_batch,
    get_blur_kernel,
    ImageUpsampler,
    ImageDownsampler,
)
from .flow import (
    coords_grid,
    bilinear_sample,
    flow_warp,
    flow_warp_nearest,
    forward_flow_warp,
    get_intermediate_warp_mask,
    forward_backward_consistency_check,
    upsample_noise,
    collect_noise_pixel,
    continuous_noise_warp,
    continuous_noise_warp_bwd,
    continuous_noise_fwd_warp,
    forward_upsample_flow_warp,
)

__all__ = [
    "mask_mse", "mask_psnr", "psnr",
    "FILTER_CHOICES", "BgType", "ImageShifter", "gen_valid_mask",
    "gen_random_offset", "fourier_shift_batch", "get_blur_kernel",
    "ImageUpsampler", "ImageDownsampler",
    "coords_grid", "bilinear_sample", "flow_warp", "flow_warp_nearest",
    "forward_flow_warp", "get_intermediate_warp_mask",
    "forward_backward_consistency_check", "upsample_noise",
    "collect_noise_pixel", "continuous_noise_warp",
    "continuous_noise_warp_bwd", "continuous_noise_fwd_warp",
    "forward_upsample_flow_warp",
]
