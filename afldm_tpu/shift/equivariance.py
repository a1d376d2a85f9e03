"""StyleGAN-3 equivariance metrics (EQ-T, EQ-T_frac, EQ-R) and the Lanczos
fractional translation operator (ref afldm/af_libs/equivariance.py). NHWC.

Translation offsets are static Python floats (the reference's usage — eval
sweeps and metric loops resolve them on the host), so slice bounds are
resolved at trace time.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.upfirdn2d import filter2d, upsample2d


def sinc(x):
    """ref equivariance.py:23-26."""
    y = jnp.abs(x * np.pi)
    z = jnp.sin(y) / jnp.clip(y, 1e-30, None)
    return jnp.where(y < 1e-30, jnp.ones_like(x), z)


def lanczos_window(x, a):
    """ref equivariance.py:29-31."""
    x = jnp.abs(x) / a
    return jnp.where(x < 1, sinc(x), jnp.zeros_like(x))


def rotation_matrix(angle):
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, s, 0], [-s, c, 0], [0, 0, 1]], dtype=np.float32)


def apply_integer_translation(x, tx, ty):
    """T_x with integer offsets, fraction-of-image units
    (ref equivariance.py:48-61)."""
    N, H, W, C = x.shape
    ix = int(np.rint(tx * W))
    iy = int(np.rint(ty * H))
    z = jnp.zeros_like(x)
    m = jnp.zeros_like(x)
    if abs(ix) < W and abs(iy) < H:
        y = x[:, max(-iy, 0): H + min(-iy, 0), max(-ix, 0): W + min(-ix, 0), :]
        z = z.at[:, max(iy, 0): H + min(iy, 0),
                 max(ix, 0): W + min(ix, 0), :].set(y)
        m = m.at[:, max(iy, 0): H + min(iy, 0),
                 max(ix, 0): W + min(ix, 0), :].set(1.0)
    return z, m


def apply_fractional_translation(x, tx, ty, a=3):
    """T_x with fractional offsets via separable Lanczos-a taps
    (ref equivariance.py:68-103). tx/ty are fractions of W/H."""
    N, H, W, C = x.shape
    txp = float(tx) * W
    typ = float(ty) * H
    ix = int(np.floor(txp))
    iy = int(np.floor(typ))
    fx = txp - ix
    fy = typ - iy
    b = a - 1

    z = jnp.zeros_like(x)
    zx0 = max(ix - b, 0)
    zy0 = max(iy - b, 0)
    zx1 = min(ix + a, 0) + W
    zy1 = min(iy + a, 0) + H
    if zx0 < zx1 and zy0 < zy1:
        taps = jnp.arange(a * 2, dtype=jnp.float32) - b
        filter_x = sinc(taps - fx) * sinc((taps - fx) / a)
        filter_y = sinc(taps - fy) * sinc((taps - fy) / a)
        y = filter2d(x, (filter_x / filter_x.sum())[None, :],
                     padding=[b, a, 0, 0])
        y = filter2d(y, (filter_y / filter_y.sum())[:, None],
                     padding=[0, 0, b, a])
        y = y[:, max(b - iy, 0): H + b + a + min(-iy - a, 0),
              max(b - ix, 0): W + b + a + min(-ix - a, 0), :]
        z = z.at[:, zy0:zy1, zx0:zx1, :].set(y)

    m = jnp.zeros_like(x)
    mx0 = max(ix + a, 0)
    my0 = max(iy + a, 0)
    mx1 = min(ix - b, 0) + W
    my1 = min(iy - b, 0) + H
    if mx0 < mx1 and my0 < my1:
        m = m.at[:, my0:my1, mx0:mx1, :].set(1.0)
    return z, m


def construct_affine_bandlimit_filter(mat, a=3, amax=16, aflt=64, up=4,
                                      cutoff_in=1, cutoff_out=1):
    """Oriented bandlimit filter for affine warps (ref equivariance.py:111-141).
    Built entirely in numpy at trace time (mat is static)."""
    assert a <= amax < aflt
    mat = np.asarray(mat, dtype=np.float32)

    taps = np.roll((np.arange(aflt * up * 2 - 1) + 1) / up - aflt,
                   1 - aflt * up)
    yi, xi = np.meshgrid(taps, taps, indexing="ij")
    pts = np.stack([xi, yi], axis=2) @ mat[:2, :2].T
    xo, yo = pts[..., 0], pts[..., 1]

    def np_sinc(v):
        return np.sinc(v)  # np.sinc is sin(pi x)/(pi x)

    def np_lanczos(v, aa):
        vv = np.abs(v) / aa
        return np.where(vv < 1, np_sinc(vv), 0.0)

    fi = np_sinc(xi * cutoff_in) * np_sinc(yi * cutoff_in)
    fo = np_sinc(xo * cutoff_out) * np_sinc(yo * cutoff_out)
    f = np.real(np.fft.ifftn(np.fft.fftn(fi) * np.fft.fftn(fo)))

    wi = np_lanczos(xi, a) * np_lanczos(yi, a)
    wo = np_lanczos(xo, a) * np_lanczos(yo, a)
    w = np.real(np.fft.ifftn(np.fft.fftn(wi) * np.fft.fftn(wo)))

    f = f * w
    c = (aflt - amax) * up
    f = np.roll(f, (aflt * up - 1,) * 2, axis=(0, 1))[c:-c, c:-c]
    f = np.pad(f, ((0, 1), (0, 1))).reshape(amax * 2, up, amax * 2, up)
    f = f / f.sum(axis=(0, 2), keepdims=True) / (up ** 2)
    f = f.reshape(amax * 2 * up, amax * 2 * up)[:-1, :-1]
    return jnp.asarray(f, dtype=jnp.float32)


def _grid_sample(img, grid, mode="bilinear"):
    """torch.nn.functional.grid_sample with padding_mode='zeros',
    align_corners=False; grid is (N, H, W, 2) in [-1, 1] (x, y)."""
    N, H, W, C = img.shape
    gx = (grid[..., 0] + 1) * W / 2 - 0.5
    gy = (grid[..., 1] + 1) * H / 2 - 0.5
    if mode == "nearest":
        # torch rounds half away from... uses round-to-nearest-even via
        # floor(x+0.5) semantics; use rint (ties-to-even) which matches
        # torch's nearest for non-tie points (ties are measure-zero here).
        ii = jnp.rint(gy)
        jj = jnp.rint(gx)
        valid = ((ii >= 0) & (ii < H) & (jj >= 0) & (jj < W))
        iic = jnp.clip(ii, 0, H - 1).astype(jnp.int32)
        jjc = jnp.clip(jj, 0, W - 1).astype(jnp.int32)
        flat = img.reshape(N, H * W, C)
        idx = (iic * W + jjc).reshape(N, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        vals = vals.reshape(N, *ii.shape[1:], C)
        return vals * valid[..., None].astype(img.dtype)
    i0 = jnp.floor(gy)
    j0 = jnp.floor(gx)
    wi = gy - i0
    wj = gx - j0

    def tap(ii, jj, w):
        valid = ((ii >= 0) & (ii <= H - 1) & (jj >= 0) & (jj <= W - 1))
        iic = jnp.clip(ii, 0, H - 1).astype(jnp.int32)
        jjc = jnp.clip(jj, 0, W - 1).astype(jnp.int32)
        flat = img.reshape(N, H * W, C)
        idx = (iic * W + jjc).reshape(N, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1)
        vals = vals.reshape(N, *ii.shape[1:], C)
        return vals * (w * valid.astype(img.dtype))[..., None]

    return (tap(i0, j0, (1 - wi) * (1 - wj))
            + tap(i0 + 1, j0, wi * (1 - wj))
            + tap(i0, j0 + 1, (1 - wi) * wj)
            + tap(i0 + 1, j0 + 1, wi * wj))


def _affine_grid(theta, N, H, W):
    """torch affine_grid, align_corners=False: normalized coords of output
    pixel centers mapped through theta (2x3)."""
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) * 2 / W - 1
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) * 2 / H - 1
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    base = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3)
    g = jnp.einsum("hwk,nik->nhwi", base, theta)  # (N, H, W, 2) -> (x, y)
    return g


def apply_affine_transformation(x, mat, up=4, **filter_kwargs):
    """ref equivariance.py:147-177."""
    N, H, W, C = x.shape
    mat = np.asarray(mat, dtype=np.float32)

    f = construct_affine_bandlimit_filter(mat, up=up, **filter_kwargs)
    assert f.ndim == 2 and f.shape[0] == f.shape[1] and f.shape[0] % 2 == 1
    p = f.shape[0] // 2

    theta = np.linalg.inv(mat)
    theta[:2, 2] *= 2
    theta[0, 2] += 1 / up / W
    theta[1, 2] += 1 / up / H
    theta[0, :] *= W / (W + p / up * 2)
    theta[1, :] *= H / (H + p / up * 2)
    theta = jnp.asarray(np.tile(theta[:2, :3][None], (N, 1, 1)))

    y = upsample2d(x, f, up=up, padding=p)
    g = _affine_grid(theta, N, H, W)
    z = _grid_sample(y, g, mode="bilinear")

    m = jnp.zeros_like(y)
    c = p * 2 + 1
    m = m.at[:, c:-c, c:-c, :].set(1.0)
    m = _grid_sample(m, g, mode="nearest")
    return z, m


def apply_fractional_rotation(x, angle, a=3, **filter_kwargs):
    """R_alpha (ref equivariance.py:184-187)."""
    mat = rotation_matrix(angle)
    return apply_affine_transformation(x, mat, a=a, amax=a * 2,
                                       **filter_kwargs)


def apply_fractional_pseudo_rotation(x, angle, a=3, **filter_kwargs):
    """R*_alpha (ref equivariance.py:195-204)."""
    mat = rotation_matrix(-angle)
    f = construct_affine_bandlimit_filter(mat, a=a, amax=a * 2, up=1,
                                          **filter_kwargs)
    y = filter2d(x, f)
    m = jnp.zeros_like(y)
    c = f.shape[0] // 2
    m = m.at[:, c:-c, c:-c, :].set(1.0)
    return y, m


def compute_equivariance_metrics(generate_fn, key, num_samples, batch_size,
                                 img_resolution, translate_max=0.125,
                                 rotate_max=1.0, compute_eqt_int=False,
                                 compute_eqt_frac=False, compute_eqr=False,
                                 axis_name=None):
    """EQ-T / EQ-T_frac / EQ-R PSNR loop (ref equivariance.py:210-287),
    generator-agnostic: ``generate_fn(key, transform_matrix) -> NHWC image``
    where ``transform_matrix`` is the 3x3 input-space transform the model
    applies (identity for the reference image). When ``axis_name`` is set,
    the partial sums are all-reduced across JAX processes (the reference
    uses torch.distributed.all_reduce, equivariance.py:281-282); the value
    of ``axis_name`` is ignored beyond being non-None — this loop runs on
    the host, not inside pmap/shard_map, so a collective axis cannot bind
    here and ``multihost_utils.process_allgather`` is the right seam."""
    assert compute_eqt_int or compute_eqt_frac or compute_eqr
    I = np.eye(3, dtype=np.float32)
    rng = np.random.default_rng(0)

    sums = None
    for start in range(0, num_samples, batch_size):
        key, sub = jax.random.split(key)
        orig = generate_fn(sub, I)
        s = []
        if compute_eqt_int:
            t = (rng.random(2) * 2 - 1) * translate_max
            t = np.round(t * img_resolution) / img_resolution
            M = I.copy()
            M[:2, 2] = -t
            img = generate_fn(sub, M)
            ref, mask = apply_integer_translation(orig, t[0], t[1])
            s += [(ref - img) ** 2 * mask, mask]
        if compute_eqt_frac:
            t = (rng.random(2) * 2 - 1) * translate_max
            M = I.copy()
            M[:2, 2] = -t
            img = generate_fn(sub, M)
            ref, mask = apply_fractional_translation(orig, t[0], t[1])
            s += [(ref - img) ** 2 * mask, mask]
        if compute_eqr:
            angle = (rng.random() * 2 - 1) * (rotate_max * np.pi)
            M = rotation_matrix(-angle)
            img = generate_fn(sub, M)
            ref, ref_mask = apply_fractional_rotation(orig, angle)
            pseudo, pseudo_mask = apply_fractional_pseudo_rotation(img, angle)
            mask = ref_mask * pseudo_mask
            s += [(ref - pseudo) ** 2 * mask, mask]
        s = jnp.stack([v.astype(jnp.float64).sum() if v.dtype == jnp.float64
                       else v.astype(jnp.float32).sum() for v in s])
        sums = s if sums is None else sums + s

    if axis_name is not None:
        from jax.experimental import multihost_utils
        sums = multihost_utils.process_allgather(sums).sum(axis=0)
    sums = np.asarray(sums)
    mses = sums[0::2] / sums[1::2]
    psnrs = np.log10(2) * 20 - np.log10(mses) * 10
    return psnrs[0] if len(psnrs) == 1 else tuple(psnrs)
