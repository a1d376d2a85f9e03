"""DDRM degradation operators vs literal numpy transcriptions of the
reference (superresolution.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from afldm_tpu.ops.superresolution import (
    bicubic_kernel_1d, SuperResolution, SRConv, build_sr4x)


def test_bicubic_taps_match_reference_formula():
    k = bicubic_kernel_1d(4)
    # literal transcription (superresolution.py:263-275)
    def kern(x, a=-0.5):
        ax = abs(x)
        if ax <= 1:
            return (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1
        if 1 < ax < 2:
            return a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a
        return 0.0
    want = np.array([kern((1 / 4) * (i - 8 + 0.5)) for i in range(16)])
    want /= want.sum()
    np.testing.assert_allclose(k, want, rtol=1e-6)
    assert abs(k.sum() - 1) < 1e-6


def test_pool_sr_h_and_pinv(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    h = SuperResolution(3, 16, 4)
    y = h.H(x)
    assert y.shape == (2, 4, 4, 3)
    # H of a constant image is that constant
    c = jnp.ones((1, 16, 16, 3))
    np.testing.assert_allclose(np.asarray(h.H(c)), 1.0, rtol=1e-6)
    # H(H_pinv(y)) == y (pinv is a right inverse)
    np.testing.assert_allclose(np.asarray(h.H(h.H_pinv(y))),
                               np.asarray(y), rtol=1e-4, atol=1e-5)


def test_srconv_matches_direct_numpy(rng):
    x = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    k = bicubic_kernel_1d(4)
    h = SRConv(k, 2, 16, stride=4)
    got = np.asarray(h.H(jnp.asarray(x)))

    # literal: reflect-pad then separable strided correlation
    pad = (len(k) - 4) // 2
    def conv_axis(a, axis):
        pads = [(0, 0)] * 4
        pads[axis] = (pad, len(k) - 4 - pad)
        ap = np.pad(a, pads, mode="reflect")
        out_len = 16 // 4
        sl = [slice(None)] * 4
        acc = np.zeros([s if i != axis else out_len
                        for i, s in enumerate(a.shape)], np.float32)
        for r in range(out_len):
            start = r * 4
            window = [slice(None)] * 4
            window[axis] = slice(start, start + len(k))
            kshape = [1, 1, 1, 1]
            kshape[axis] = len(k)
            slc = [slice(None)] * 4
            slc[axis] = r
            acc[tuple(slc)] = (ap[tuple(window)]
                               * k.reshape(kshape)).sum(axis=axis)
        return acc
    want = conv_axis(conv_axis(x, 1), 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_srconv_h_pinv_right_inverse(rng):
    k = bicubic_kernel_1d(2)
    h = SRConv(k, 1, 16, stride=2)
    y = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
    y2 = h.H(h.H_pinv(y))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), rtol=1e-3,
                               atol=1e-4)


def test_build_sr4x_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    for f in ("pool", "bicubic"):
        out = build_sr4x(f, 32)(x)
        assert out.shape == x.shape
        # 4x degradation: result is blocky (constant within 4x4 blocks)
        o = np.asarray(out)
        assert np.allclose(o[0, 0:4, 0:4, 0], o[0, 0, 0, 0])
