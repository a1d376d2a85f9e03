"""Masked MSE / PSNR metrics (ref afldm/shift_utils/metrics.py:5-20). NHWC."""

import jax.numpy as jnp


def mask_mse(a, b, mask):
    """Per-sample masked MSE averaged over the batch (metrics.py:5-8)."""
    diff = (a * mask - b * mask) ** 2
    batch_loss = diff.sum(axis=(1, 2, 3)) / mask.sum(axis=(1, 2, 3))
    return batch_loss.mean()


def mask_psnr(a, b, mask):
    """PSNR with dynamic range from the masked tensors (metrics.py:11-15)."""
    a_ = a * mask
    b_ = b * mask
    i_max = jnp.maximum(a_.max(), b_.max()) - jnp.minimum(a_.min(), b_.min())
    return 10.0 * jnp.log10(i_max * i_max / mask_mse(a, b, mask))


def psnr(a, b, i_max=None):
    """Plain PSNR with dynamic range from the tensors (metrics.py:17-20)."""
    if i_max is None:
        i_max = jnp.maximum(a.max(), b.max()) - jnp.minimum(a.min(), b.min())
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(i_max * i_max / mse)
