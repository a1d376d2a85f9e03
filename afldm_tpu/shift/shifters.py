"""Image/latent shifters with six filter modes and occlusion-aware masks
(ref afldm/shift_utils/shifters.py). NHWC.

Functional design notes vs the reference:

- The reference's ``ImageShifter`` caches the ideally-upsampled image by
  pointer identity (shifters.py:165-170). Here ``precompute()`` returns the
  cache explicitly and ``shift()`` takes it as an optional argument, so the
  pipeline scan carries it as a plain array (pure/jit-friendly).
- Offsets may be Python floats (static, eval sweeps) or traced scalars
  (training shift loss): mask construction uses iota comparisons instead of
  slicing, and ideal-mode rolls use ``jnp.roll`` with traced shifts.
- PRNG is explicit (``jax.random`` keys) everywhere the reference used
  global torch RNG.
"""

from enum import Enum

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.ideal_lpf import upsample_rfft, lpf_recon_rfft, downsample_rfft
from ..ops.upfirdn2d import upfirdn2d
from .flow import flow_warp
from .equivariance import apply_fractional_translation

FILTER_CHOICES = [
    "bilinear",
    "lanczos",
    "ideal",
    "ideal_crop",
    "fourier",
    "fourier_crop",
]


class BgType(Enum):
    NO_BG = 0
    RANDN = 1
    FULL_COLOR = 2
    ORIGINAL_IMG = 3


def gen_valid_mask(shape, ti, tj):
    """1 where a (ti, tj)-shift keeps valid content, 0 in the wrapped-in
    band (ref shifters.py:31-49). Works with traced offsets."""
    _, h, w, _ = shape
    ti = jnp.asarray(ti, jnp.float32)
    tj = jnp.asarray(tj, jnp.float32)
    i1 = jnp.where(ti >= 0, 0.0, h + jnp.floor(ti))
    i2 = jnp.where(ti >= 0, jnp.ceil(ti), float(h))
    j1 = jnp.where(tj >= 0, 0.0, w + jnp.floor(tj))
    j2 = jnp.where(tj >= 0, jnp.ceil(tj), float(w))
    ridx = jnp.arange(h, dtype=jnp.float32)
    cidx = jnp.arange(w, dtype=jnp.float32)
    row_ok = ~((ridx >= i1) & (ridx < i2))
    col_ok = ~((cidx >= j1) & (cidx < j2))
    mask = (row_ok[:, None] & col_ok[None, :]).astype(jnp.float32)
    return jnp.broadcast_to(mask[None, :, :, None], shape)


def gen_random_offset(key, max_offset_i, max_offset_j, int_offset, int_stride,
                      bs=1, min_offset_i=0, min_offset_j=0):
    """Random (ti, tj) offsets, integer-grid or continuous
    (ref shifters.py:52-76)."""
    len_i = max_offset_i - min_offset_i
    len_j = max_offset_j - min_offset_j
    ki, kj = jax.random.split(key)
    if int_offset:
        range_i = int(len_i // int_stride)
        range_j = int(len_j // int_stride)
        oi = jax.random.randint(ki, (bs,), -range_i, range_i + 1).astype(jnp.float32)
        oj = jax.random.randint(kj, (bs,), -range_j, range_j + 1).astype(jnp.float32)
        oi = oi * int_stride
        oj = oj * int_stride
    else:
        oi = (jax.random.uniform(ki, (bs,)) * 2 - 1) * len_i
        oj = (jax.random.uniform(kj, (bs,)) * 2 - 1) * len_j
    return oi + min_offset_i, oj + min_offset_j


def fourier_shift_batch(image, shift_i, shift_j):
    """Exact periodic fractional shift via FFT phase ramp
    (ref shifters.py:101-132; the reference passes (ti, tj) as
    (shift_x, shift_y) and builds U over W / V over H with meshgrid 'ij',
    which results in shifting H by ti and W by tj — replicated here)."""
    N, H, W, C = image.shape
    dtype = image.dtype
    x = image.astype(jnp.float32)
    X = jnp.fft.fft2(x, axes=(1, 2))
    u = jnp.fft.fftfreq(H).astype(jnp.float32)
    v = jnp.fft.fftfreq(W).astype(jnp.float32)
    phase = jnp.exp(-2j * np.pi * (jnp.asarray(shift_i, jnp.float32) * u[:, None]
                                   + jnp.asarray(shift_j, jnp.float32) * v[None, :]))
    out = jnp.real(jnp.fft.ifft2(X * phase[None, :, :, None], axes=(1, 2)))
    return out.astype(dtype)


class ImageShifter:
    """Six-mode shifter (ref shifters.py:135-206). Stateless: ideal modes
    take an optional precomputed upsample cache."""

    def __init__(self, filter: str | None = None, upsample_ratio: int | None = None):
        if filter is None:
            filter = "bilinear"
        assert filter in FILTER_CHOICES, f"Wrong filter type {filter}"
        self.filter = filter
        if filter in ("ideal", "ideal_crop"):
            assert upsample_ratio is not None
            self.upsample_ratio = upsample_ratio

    def precompute(self, img):
        """Ideal-mode upsample cache (the reference's pointer-keyed cache,
        shifters.py:165-170)."""
        if self.filter not in ("ideal", "ideal_crop"):
            return None
        if self.upsample_ratio == 1:
            return img
        return upsample_rfft(img, up=self.upsample_ratio)

    def shift(self, img, ti, tj, cache=None):
        """Returns (warped, mask). ti shifts H, tj shifts W (the reference's
        NCHW dims (2, 3))."""
        n, h, w, _ = img.shape
        if self.filter == "lanczos":
            warped, mask = apply_fractional_translation(img, tj / w, ti / h)
            mask = mask[..., 0:1]
            return warped, mask
        if self.filter in ("ideal", "ideal_crop"):
            up = self.upsample_ratio
            if cache is None:
                cache = self.precompute(img)
            si = jnp.round(jnp.asarray(ti, jnp.float32) * up).astype(jnp.int32)
            sj = jnp.round(jnp.asarray(tj, jnp.float32) * up).astype(jnp.int32)
            warped = jnp.roll(cache, shift=(si, sj), axis=(1, 2))
            if self.filter == "ideal":
                warped = warped[:, ::up, ::up, :]
                return warped, jnp.ones_like(warped)
            upsampled_mask = gen_valid_mask(warped.shape, si, sj)
            warped = warped * upsampled_mask
            warped = warped[:, ::up, ::up, :]
            mask = gen_valid_mask(warped.shape, ti, tj)
            return warped, mask
        if self.filter == "fourier":
            warped = fourier_shift_batch(img, ti, tj)
            return warped, jnp.ones_like(warped)
        if self.filter == "fourier_crop":
            warped = fourier_shift_batch(img, ti, tj)
            mask = gen_valid_mask(warped.shape, ti, tj)
            return warped * mask, mask
        # bilinear backward warp
        ti = jnp.asarray(ti, jnp.float32)
        tj = jnp.asarray(tj, jnp.float32)
        bwd_flow = jnp.broadcast_to(
            jnp.stack([-ti, -tj]).reshape(1, 1, 1, 2), (n, h, w, 2))
        warped, mask = flow_warp(img, bwd_flow, True)
        return warped, mask[..., None].astype(jnp.float32)

    def translate_with_occ_bg(self, key, img, ti, tj, bg_type: BgType,
                              mask=None, return_mask=False, cache=None):
        """Shift and fill disoccluded pixels with a background
        (ref shifters.py:208-235). ``key`` is only used for random
        backgrounds."""
        if bg_type == BgType.RANDN:
            background = jax.random.normal(key, img.shape, img.dtype)
        elif bg_type == BgType.FULL_COLOR:
            n, c = img.shape[0], img.shape[-1]
            background = (jax.random.uniform(key, (n, 1, 1, c), img.dtype)
                          * 2 - 1)
        elif bg_type == BgType.ORIGINAL_IMG:
            background = img
        elif bg_type != BgType.NO_BG:
            raise ValueError(f"No such background type {bg_type}")
        warped, translate_mask = self.shift(img, ti, tj, cache=cache)
        if mask is None:
            mask = translate_mask
        if bg_type != BgType.NO_BG:
            warped = warped * mask + background * (1 - mask)
        if return_mask:
            return warped, mask
        return warped

    def image_latent_random_translate(self, key, img, latent, max_offset_i,
                                      max_offset_j, batch_size=1,
                                      int_offset=False, align_latent=False):
        """Jointly shift an image and its latent by a shared random offset
        (ref shifters.py:237-265; the reference's version crashes on a stale
        enum access at :263 — fixed here per SURVEY.md §2.12 item 5)."""
        n, h, w, _ = img.shape
        n2, h2, w2, _ = latent.shape
        assert n == n2 and h * w2 == w * h2
        ratio = h / h2
        assert ratio == round(ratio)

        img = jnp.tile(img, (batch_size, 1, 1, 1))
        latent = jnp.tile(latent, (batch_size, 1, 1, 1))
        n *= batch_size

        int_stride = ratio if align_latent else 1
        k_off, k_bg1, k_bg2 = jax.random.split(key, 3)
        ti, tj = gen_random_offset(k_off, max_offset_i, max_offset_j,
                                   int_offset, int_stride)
        ti, tj = ti[0], tj[0]

        bg = (jax.random.uniform(k_bg1, (n, 1, 1, img.shape[-1]), img.dtype)
              * 2 - 1)
        bwd_flow = jnp.broadcast_to(
            jnp.stack([-ti, -tj]).reshape(1, 1, 1, 2), (n, h, w, 2))
        warped_img, bwd_mask = flow_warp(img, bwd_flow, True)
        bwd_mask = bwd_mask[..., None].astype(jnp.float32)
        warped_img = warped_img * bwd_mask + bg * (1 - bwd_mask)

        latent_mask = bwd_mask[:, :: int(ratio), :: int(ratio), :]
        warped_latent = self.translate_with_occ_bg(
            k_bg2, latent, ti / ratio, tj / ratio, BgType.FULL_COLOR,
            latent_mask)
        return warped_img, warped_latent, bwd_mask, latent_mask


def get_blur_kernel(length=4):
    """Normalized binomial blur kernel (ref shifters.py:268-278, single
    channel — the reference's cross-channel repeat is never used)."""
    if length == 4:
        k = (1, 3, 3, 1)
    elif length == 5:
        k = (1, 3, 6, 3, 1)
    else:
        raise ValueError(length)
    k = np.asarray(k, dtype=np.float32)
    k2 = np.outer(k, k)
    return jnp.asarray(k2 / k2.sum())


def upsample_pad_zero(x, scale):
    """Zero-stuffing upsample (ref shifters.py:281-290): every input
    pixel lands at the top-left of its scale x scale output cell, zeros
    elsewhere. NHWC."""
    n, h, w, c = x.shape
    out = jnp.zeros((n, h, scale, w, scale, c), x.dtype)
    out = out.at[:, :, 0, :, 0, :].set(x)
    return out.reshape(n, h * scale, w * scale, c)


class ImageUpsampler:
    """nearest / ideal / blur upsampling (ref shifters.py:293-338).
    The 'learn' mode (a ConvTranspose seeded with the blur kernel) lives in
    the model zoo instead — it needs parameters."""

    def __init__(self, scale=2, mode="nearest"):
        self.scale = scale
        self.mode = mode
        if mode == "blur":
            self.blur_kernel = get_blur_kernel(4)

    def low_pass(self, x):
        if self.mode == "blur":
            return upfirdn2d(x, self.blur_kernel * 4, up=2,
                             padding=(2, 1, 2, 1))
        if self.mode == "ideal":
            return lpf_recon_rfft(x, cutoff=1 / self.scale)
        return jax.image.resize(
            x, (x.shape[0], x.shape[1] * self.scale,
                x.shape[2] * self.scale, x.shape[3]), self.mode)

    def upsample(self, x):
        if self.mode == "blur":
            return upfirdn2d(x, self.blur_kernel * self.scale ** 2,
                             up=self.scale, padding=(2, 1, 2, 1))
        if self.mode == "ideal":
            return upsample_rfft(x, up=self.scale)
        return jax.image.resize(
            x, (x.shape[0], x.shape[1] * self.scale,
                x.shape[2] * self.scale, x.shape[3]), self.mode)


class LearnedUpsampler:
    """The reference ImageUpsampler 'learn' mode (shifters.py:303-331):
    a ConvTranspose(1, 1, 4, stride=scale, pad=1) seeded with the binomial
    blur kernel * scale^2; here a functional param + apply pair so trainers
    can optimize the kernel."""

    def __init__(self, scale=2):
        self.scale = scale

    def init_params(self):
        import numpy as _np
        k = _np.asarray(get_blur_kernel(4)) * self.scale ** 2
        return {"kernel": jnp.asarray(k, jnp.float32)}

    def upsample(self, params, x):
        # ConvTranspose(1,1,4,stride,1) == upfirdn2d(up, pad=(2,1,2,1)) with
        # the same kernel — the equivalence the reference itself notes
        # (shifters.py:330)
        return upfirdn2d(x, params["kernel"], up=self.scale,
                         padding=(2, 1, 2, 1))


class ImageDownsampler:
    """nearest / ideal / blur downsampling (ref shifters.py:341-365).
    NOTE: the reference's 'ideal' mode passes ``scale`` as the LPF *cutoff*
    (shifters.py:347), which builds a no-op/broken mask; the intended
    cutoff 1/scale is used here (SURVEY.md §2 divergence note)."""

    def __init__(self, scale=2, mode="nearest"):
        self.scale = scale
        self.mode = mode
        if mode == "blur":
            self.blur_kernel = get_blur_kernel(4)

    def downsample(self, x):
        if self.mode == "blur":
            y = upfirdn2d(x, self.blur_kernel, down=self.scale,
                          padding=(2, 1, 2, 1))
            return y
        if self.mode == "ideal":
            return downsample_rfft(x, down=self.scale)
        return jax.image.resize(
            x, (x.shape[0], x.shape[1] // self.scale,
                x.shape[2] // self.scale, x.shape[3]), self.mode)
