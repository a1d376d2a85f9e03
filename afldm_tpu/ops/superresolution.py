"""DDRM-style super-resolution degradation operators (ref
afldm/af_libs/superresolution.py, duplicated at trainers/corruption/):
the SVD-wrapped H_functions toolkit (H, Ht, H_pinv) for block-pooling and
separable bicubic downsampling, plus the fixed 4x degrade->nearest-upsample
closure the I2SB trainer uses (build_sr4x, superresolution.py:288-320).

NHWC. The bicubic taps match DDRM exactly (a=-0.5, 4*factor support,
half-pixel centering); SRConv applies them separably with symmetric
boundary reflection (the reference's j<0 -> -j-1 / j>=n -> 2n-1-j rule,
superresolution.py:180-184) and stride=factor."""

import numpy as np
import jax.numpy as jnp
from jax import lax


def bicubic_kernel_1d(factor: int, a: float = -0.5) -> np.ndarray:
    """ref superresolution.py:263-275."""
    def k(x):
        ax = abs(x)
        if ax <= 1:
            return (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1
        if 1 < ax < 2:
            return a * ax ** 3 - 5 * a * ax ** 2 + 8 * a * ax - 4 * a
        return 0.0
    taps = np.zeros(factor * 4)
    for i in range(factor * 4):
        x = (1 / factor) * (i - np.floor(factor * 4 / 2) + 0.5)
        taps[i] = k(x)
    return (taps / taps.sum()).astype(np.float32)


class HFunctions:
    """Degradation operator with SVD access (ref H_functions ABC,
    superresolution.py:20-87). Subclasses define H (degrade); Ht/H_pinv
    come from the SVD factors."""

    def H(self, x):
        raise NotImplementedError

    def Ht(self, y):
        raise NotImplementedError

    def H_pinv(self, y):
        raise NotImplementedError


class SuperResolution(HFunctions):
    """Block-average pooling SR (ref superresolution.py:89-157). The SVD is
    analytic: each factor x factor block has one singular vector (uniform)
    with singular value 1/factor."""

    def __init__(self, channels, img_dim, ratio):
        self.ratio = ratio
        self.img_dim = img_dim
        self.channels = channels

    def H(self, x):
        n, h, w, c = x.shape
        r = self.ratio
        y = x.reshape(n, h // r, r, w // r, r, c).mean(axis=(2, 4))
        return y

    def Ht(self, y):
        r = self.ratio
        return jnp.repeat(jnp.repeat(y, r, 1), r, 2) / (r * r)

    def H_pinv(self, y):
        r = self.ratio
        return jnp.repeat(jnp.repeat(y, r, 1), r, 2)


class SRConv(HFunctions):
    """Separable strided FIR degradation with symmetric boundary
    reflection (ref superresolution.py:160-260)."""

    def __init__(self, kernel, channels, img_dim, stride):
        self.kernel = jnp.asarray(kernel, jnp.float32)
        self.stride = stride
        self.img_dim = img_dim
        self.channels = channels
        self.pad = (len(kernel) - stride) // 2
        self._A = None      # cached (img_dim//stride, img_dim) conv matrix
        self._Apinv = None  # cached truncated pinv of _A

    def _conv1d(self, x, axis):
        k = self.kernel
        klen = k.shape[0]
        pad_cfg = [(0, 0)] * 4
        pad_cfg[axis] = (self.pad, klen - self.stride - self.pad)
        xp = jnp.pad(x, pad_cfg, mode="symmetric")
        kern_shape = (klen, 1) if axis == 1 else (1, klen)
        kern = k.reshape(*kern_shape, 1, 1)
        C = x.shape[-1]
        kern = jnp.broadcast_to(kern, (*kern_shape, 1, C))
        strides = (self.stride, 1) if axis == 1 else (1, self.stride)
        return lax.conv_general_dilated(
            xp, kern, strides, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
            # exact taps on the MXU: the degradation operator feeds the
            # I2SB parity path, and bf16-default conv costs ~2e-3 abs err
            precision=lax.Precision.HIGHEST)

    def H(self, x):
        return self._conv1d(self._conv1d(x, 1), 2)

    def H_pinv(self, y):
        """Least-squares upsampling via the truncated pinv of the 1D conv
        matrix (built and cached once with numpy). The reference zeroes 1D
        singular values < 3e-2 before inverting (superresolution.py:191-192);
        a plain np.linalg.pinv keeps them and explodes the border modes."""
        Ap = jnp.asarray(self._conv_pinv())  # (img_dim, img_dim//stride)
        hi = lax.Precision.HIGHEST
        y = jnp.einsum("hH,nHwc->nhwc", Ap, y, precision=hi)
        y = jnp.einsum("wW,nhWc->nhwc", Ap, y, precision=hi)
        return y

    def Ht(self, y):
        A = jnp.asarray(self._conv_matrix())
        hi = lax.Precision.HIGHEST
        y = jnp.einsum("Hh,nHwc->nhwc", A, y, precision=hi)
        return jnp.einsum("Ww,nhWc->nhwc", A, y, precision=hi)

    def _conv_matrix(self):
        if self._A is not None:
            return self._A
        n = self.img_dim
        k = np.asarray(self.kernel)
        klen = len(k)
        rows = n // self.stride
        A = np.zeros((rows, n), np.float32)
        for r in range(rows):
            start = r * self.stride - self.pad
            for i in range(klen):
                j = start + i
                # symmetric reflection (ref superresolution.py:180-184)
                if j < 0:
                    j = -j - 1
                if j >= n:
                    j = 2 * n - 1 - j
                A[r, j] += k[i]
        self._A = A
        return A

    def _conv_pinv(self):
        if self._Apinv is not None:
            return self._Apinv
        A = self._conv_matrix()
        u, s, vt = np.linalg.svd(A, full_matrices=False)
        s_inv = np.where(s < 3e-2, 0.0, 1.0 / np.maximum(s, 1e-30))
        self._Apinv = ((vt.T * s_inv) @ u.T).astype(np.float32)
        return self._Apinv


def build_sr_bicubic(factor, image_size, data_channels=3):
    """ref superresolution.py:263-280."""
    k = bicubic_kernel_1d(factor)
    return SRConv(k / k.sum(), data_channels, image_size, stride=factor)


def build_sr_pool(factor, image_size, data_channels=3):
    return SuperResolution(data_channels, image_size, factor)


def build_sr4x(sr_filter, image_size, data_channels=3):
    """Fixed 4x degrade + nearest re-upsample closure
    (ref superresolution.py:288-320)."""
    assert sr_filter in ("pool", "bicubic")
    factor = 4
    h = (build_sr_pool(factor, image_size, data_channels)
         if sr_filter == "pool"
         else build_sr_bicubic(factor, image_size, data_channels))

    def sr4x(img):
        low = h.H(img)
        return jnp.repeat(jnp.repeat(low, factor, 1), factor, 2)

    return sr4x
