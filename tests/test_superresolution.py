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


def _reference_h_small(kernel, img_dim, stride):
    """Literal transcription of the reference's 1D conv-matrix loop
    (superresolution.py:176-186): symmetric boundary reflection
    (j<0 -> -j-1, j>=n -> 2n-1-j), rows centered at i = stride//2 + r*stride."""
    klen = len(kernel)
    H_small = np.zeros((img_dim // stride, img_dim), np.float32)
    for i in range(stride // 2, img_dim + stride // 2, stride):
        for j in range(i - klen // 2, i + klen // 2):
            je = j
            if je < 0:
                je = -je - 1
            if je >= img_dim:
                je = (img_dim - 1) - (je - img_dim)
            H_small[i // stride, je] += kernel[j - i + klen // 2]
    return H_small


def test_srconv_matrix_matches_reference_loop():
    # the r4 review found the old 'reflect' padding diverged from the
    # reference in the border rows by up to ~10% of kernel mass — pin the
    # conv matrix (and thus H/Ht/H_pinv) to the literal reference loop
    for factor, dim in ((4, 64), (2, 16)):
        k = bicubic_kernel_1d(factor)
        h = SRConv(k, 1, dim, stride=factor)
        np.testing.assert_allclose(h._conv_matrix(),
                                   _reference_h_small(k, dim, factor),
                                   rtol=1e-6, atol=1e-7)


def test_srconv_matches_direct_numpy(rng):
    # the separable strided conv (H) must equal applying the reference's
    # H_small matrix along each spatial axis
    x = rng.standard_normal((1, 16, 16, 2)).astype(np.float32)
    k = bicubic_kernel_1d(4)
    h = SRConv(k, 2, 16, stride=4)
    got = np.asarray(h.H(jnp.asarray(x)))
    A = _reference_h_small(k, 16, 4)
    want = np.einsum("Hh,nhwc->nHwc", A, x)
    want = np.einsum("Ww,nhwc->nhWc", A, want)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_srconv_pinv_truncates_small_singulars():
    # the reference zeroes 1D singular values < 3e-2 before inverting
    # (superresolution.py:191-192); a plain pinv would keep them
    k = bicubic_kernel_1d(4)
    h = SRConv(k, 1, 64, stride=4)
    A = h._conv_matrix()
    u, s, vt = np.linalg.svd(A, full_matrices=False)
    s_inv = np.where(s < 3e-2, 0.0, 1.0 / np.maximum(s, 1e-30))
    want = (vt.T * s_inv) @ u.T
    np.testing.assert_allclose(h._conv_pinv(), want, rtol=1e-5, atol=1e-6)
    # and the cache returns the same array object on the second call
    assert h._conv_pinv() is h._conv_pinv()


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
