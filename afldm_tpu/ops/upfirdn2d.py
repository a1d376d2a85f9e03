"""upfirdn2d — pad, zero-stuff-upsample, FIR-filter, decimate. NHWC.

TPU-native equivalent of the reference's CUDA plugin + PyTorch fallback
(``afldm/af_libs/torch_utils/ops/upfirdn2d.py:118-211`` and the kernels in
``upfirdn2d.cu``). Semantics match the reference exactly:

1. zero-stuff by ``up`` (insert up-1 zeros *after* each pixel),
2. pad by ``padding`` (negative = crop) around the upsampled grid,
3. correlate with ``f`` flipped (convolution) unless ``flip_filter``,
4. keep every ``down``-th pixel.

``padding`` follows the reference convention ``[x0, x1, y0, y1]`` where x is
width and y is height (upfirdn2d.py:179). The filter is scaled by
``gain ** (f.ndim / 2)`` per pass (upfirdn2d.py:196).

Instead of a hand-written kernel we express the op as a single
``lax.conv_general_dilated`` with ``lhs_dilation`` (zero-stuffing),
per-dimension padding, and ``window_strides`` (decimation): XLA's TPU conv
emitter fuses all four stages into one pass over the MXU, and reverse-mode
AD automatically yields the transposed upfirdn (the identity the reference
hand-codes at upfirdn2d.py:251-269). Separable 1D filters run as two 1D
convs, mirroring upfirdn2d.py:244-245.
"""

import numpy as np
import jax.numpy as jnp
from jax import lax


def _parse_scaling(scaling):
    if isinstance(scaling, int):
        scaling = [scaling, scaling]
    sx, sy = scaling
    assert sx >= 1 and sy >= 1
    return int(sx), int(sy)


def _parse_padding(padding):
    if isinstance(padding, int):
        padding = [padding, padding]
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        padding = [px, px, py, py]
    px0, px1, py0, py1 = padding
    return int(px0), int(px1), int(py0), int(py1)


def _get_filter_size(f):
    if f is None:
        return 1, 1
    assert f.ndim in (1, 2)
    fw = int(f.shape[-1])
    fh = int(f.shape[0])
    return fw, fh


def setup_filter(f, normalize=True, flip_filter=False, gain=1,
                 separable=None):
    """Convenience for FIR filter setup (ref upfirdn2d.py:77-114)."""
    if f is None:
        f = 1
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[np.newaxis]
    assert f.ndim in (1, 2)
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = f[::-1] if f.ndim == 1 else f[::-1, ::-1]
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f.copy())


def _conv_fir(x, f2d, stride, dilation, padding):
    """Depthwise NHWC conv of x with a single shared FIR filter."""
    C = x.shape[-1]
    kern = jnp.broadcast_to(f2d[:, :, None, None],
                            (*f2d.shape, 1, C)).astype(x.dtype)
    return lax.conv_general_dilated(
        x, kern,
        window_strides=stride,
        padding=padding,
        lhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def upfirdn2d(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """See module docstring. x is NHWC; f is a 1D (separable) or 2D filter."""
    assert x.ndim == 4
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (1, 2)
    upx, upy = _parse_scaling(up)
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)

    in_h, in_w = x.shape[1], x.shape[2]
    assert in_w * upx + padx0 + padx1 >= f.shape[-1]
    assert in_h * upy + pady0 + pady1 >= f.shape[0]

    dtype = x.dtype
    xf = x.astype(jnp.float32)

    fg = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        fg = fg[::-1] if fg.ndim == 1 else fg[::-1, ::-1]

    # lax.conv padding is applied to the lhs-dilated input, and negative
    # values crop — exactly the reference's pad-or-crop stage
    # (upfirdn2d.py:191-193). lhs_dilation inserts zeros *between* elements;
    # the reference zero-stuffs *after* each pixel, i.e. dilation plus
    # (up-1) trailing zeros, which we add to the high padding.
    if fg.ndim == 2:
        y = _conv_fir(
            xf, fg,
            stride=(downy, downx),
            dilation=(upy, upx),
            padding=((pady0, pady1 + upy - 1), (padx0, padx1 + upx - 1)),
        )
    else:
        # Separable: filter W then H (order irrelevant; gain split per pass).
        y = _conv_fir(
            xf, fg[None, :],
            stride=(1, downx),
            dilation=(1, upx),
            padding=((0, 0), (padx0, padx1 + upx - 1)),
        )
        y = _conv_fir(
            y, fg[:, None],
            stride=(downy, 1),
            dilation=(upy, 1),
            padding=((pady0, pady1 + upy - 1), (0, 0)),
        )
    return y.astype(dtype)


def filter2d(x, f, padding=0, flip_filter=False, gain=1):
    """Same-size FIR filtering (ref upfirdn2d.py:277-309)."""
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + fw // 2,
        padx1 + (fw - 1) // 2,
        pady0 + fh // 2,
        pady1 + (fh - 1) // 2,
    ]
    return upfirdn2d(x, f, padding=p, flip_filter=flip_filter, gain=gain)


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1):
    """FIR upsampling (ref upfirdn2d.py:313-348)."""
    upx, upy = _parse_scaling(up)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    ]
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter,
                     gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1):
    """FIR downsampling (ref upfirdn2d.py:352-387)."""
    downx, downy = _parse_scaling(down)
    padx0, padx1, pady0, pady1 = _parse_padding(padding)
    fw, fh = _get_filter_size(f)
    p = [
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    ]
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter,
                     gain=gain)


def conv2d_resample(x, w, f=None, up=1, down=1, padding=0, groups=1,
                    flip_weight=True, flip_filter=False):
    """2D conv with optional FIR up/downsampling — the reference's
    semantics exactly (torch_utils/ops/conv2d_resample.py:46-140: padding
    applied ONCE relative to the upsampled image, with the documented
    filter-size adjustments; this is its generic fallback formula, which
    its fast paths equal). XLA fuses/optimizes, so no fast-path zoo here.

    x: NHWC; w: (kh, kw, in/groups, out) HWIO. ``flip_weight=True`` means
    correlation (the torch conv2d convention the reference defaults to)."""
    assert x.ndim == 4 and w.ndim == 4
    fw, fh = _get_filter_size(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    # padding adjustments (conv2d_resample.py:81-91)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    in_dtype = x.dtype
    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=(px0, px1, py0, py1), gain=up ** 2,
                  flip_filter=flip_filter)
    kern = w if flip_weight else w[::-1, ::-1]
    # conv accumulates in f32; restore the input dtype on the way out
    # (the torch reference keeps the input dtype throughout)
    x = lax.conv_general_dilated(
        x.astype(jnp.float32), kern.astype(jnp.float32),
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x.astype(in_dtype)
