"""upfirdn2d vs a literal numpy transcription of the reference algorithm
(afldm/af_libs/torch_utils/ops/upfirdn2d.py:167-211)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.ops import upfirdn2d, filter2d, upsample2d, downsample2d, setup_filter


def _upfirdn2d_numpy(x, f, up=1, down=1, padding=0, flip_filter=False, gain=1):
    """Literal port of the reference algorithm, NHWC. Golden for tests."""
    if isinstance(up, int):
        up = (up, up)
    upx, upy = up
    if isinstance(down, int):
        down = (down, down)
    downx, downy = down
    if isinstance(padding, int):
        padding = [padding] * 4
    elif len(padding) == 2:
        padding = [padding[0], padding[0], padding[1], padding[1]]
    padx0, padx1, pady0, pady1 = padding

    x = np.asarray(x, dtype=np.float64)
    f = np.asarray(f, dtype=np.float64)
    n, h, w, c = x.shape

    # zero-stuff (zeros after each pixel)
    z = np.zeros((n, h, upy, w, upx, c))
    z[:, :, 0, :, 0, :] = x
    z = z.reshape(n, h * upy, w * upx, c)

    # pad / crop
    z = np.pad(z, ((0, 0), (max(pady0, 0), max(pady1, 0)),
                   (max(padx0, 0), max(padx1, 0)), (0, 0)))
    z = z[:, max(-pady0, 0): z.shape[1] - max(-pady1, 0),
          max(-padx0, 0): z.shape[2] - max(-padx1, 0), :]

    ff = f * (gain ** (f.ndim / 2))
    if not flip_filter:
        ff = ff[::-1] if ff.ndim == 1 else ff[::-1, ::-1]

    if ff.ndim == 1:
        # apply as two 1D correlations
        def corr1d(a, k, axis):
            klen = len(k)
            out_len = a.shape[axis] - klen + 1
            sl = [slice(None)] * a.ndim
            acc = 0
            for i in range(klen):
                sl[axis] = slice(i, i + out_len)
                acc = acc + a[tuple(sl)] * k[i]
            return acc
        z = corr1d(z, ff, axis=2)
        z = corr1d(z, ff, axis=1)
    else:
        fh, fw = ff.shape
        oh = z.shape[1] - fh + 1
        ow = z.shape[2] - fw + 1
        acc = np.zeros((n, oh, ow, c))
        for i in range(fh):
            for j in range(fw):
                acc += z[:, i:i + oh, j:j + ow, :] * ff[i, j]
        z = acc

    return z[:, ::downy, ::downx, :]


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, 1), (2, 1, (2, 1, 2, 1)), (1, 2, (2, 1, 2, 1)),
    (2, 2, 3), (1, 1, (-1, 2, 0, 1)), (4, 1, (3, 3, 3, 3)),
])
def test_upfirdn2d_matches_reference(rng, up, down, padding):
    x = rng.standard_normal((2, 12, 10, 3)).astype(np.float32)
    f = rng.standard_normal((4, 3)).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f),
                               up=up, down=down, padding=padding, gain=2.0))
    want = _upfirdn2d_numpy(x, f, up=up, down=down, padding=padding, gain=2.0)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_upfirdn2d_separable_matches_outer(rng):
    x = rng.standard_normal((1, 9, 9, 2)).astype(np.float32)
    f1 = np.array([1, 3, 3, 1], np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f1),
                               up=2, padding=(2, 1, 2, 1), gain=4))
    want = _upfirdn2d_numpy(x, np.outer(f1, f1), up=2,
                            padding=(2, 1, 2, 1), gain=4)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_flip_filter(rng):
    x = rng.standard_normal((1, 8, 8, 1)).astype(np.float32)
    f = rng.standard_normal((3, 3)).astype(np.float32)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f),
                               padding=1, flip_filter=True))
    want = _upfirdn2d_numpy(x, f, padding=1, flip_filter=True)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_filter2d_same_shape(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1], separable=False)
    y = filter2d(jnp.asarray(x), f)
    assert y.shape == x.shape


def test_upsample_downsample_shapes(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    f = setup_filter([1, 3, 3, 1], separable=False)
    assert upsample2d(x, f).shape == (2, 16, 16, 3)
    assert downsample2d(x, f).shape == (2, 4, 4, 3)


def test_upfirdn2d_grad_is_transposed_upfirdn(rng):
    """Reverse-mode AD must give the transposed-upfirdn identity
    (reference hand-codes this at upfirdn2d.py:251-269)."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)).astype(np.float32))
    f = jnp.asarray(np.array([[1., 2.], [3., 4.]], np.float32))

    def loss(x):
        return jnp.sum(upfirdn2d(x, f, up=2, down=1, padding=1) ** 2)

    g = jax.grad(loss)(x)
    # numerical check
    eps = 1e-3
    i, j = 3, 4
    xp = x.at[0, i, j, 0].add(eps)
    xm = x.at[0, i, j, 0].add(-eps)
    num = (loss(xp) - loss(xm)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g[0, i, j, 0]), np.asarray(num),
                               rtol=1e-2, atol=1e-2)
