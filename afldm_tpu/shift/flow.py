"""Optical-flow warping utilities. NHWC; flow is (N, H, W, 2) with the last
axis ordered (di, dj) = (row offset, col offset) — the convention of the
reference's ``flow_warp`` after its internal flip
(afldm/shift_utils/flow_utils.py:79-86).

The reference's forward-splat warps are numba CPU kernels with GPU<->CPU
round-trips (flow_utils_np.py:31-35,155-160); here they are XLA scatter-adds
(``.at[].add``) that stay on device and vectorize over batch and channel —
order-independent sums, so results match the sequential loops exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp


def coords_grid(b, h, w):
    """(B, H, W, 2) grid of (i, j) pixel coordinates (ref flow_utils.py:34,
    which stacks (x, y); we standardize on (i, j))."""
    i = jnp.arange(h, dtype=jnp.float32)[:, None]
    j = jnp.arange(w, dtype=jnp.float32)[None, :]
    grid = jnp.stack([jnp.broadcast_to(i, (h, w)),
                      jnp.broadcast_to(j, (h, w))], axis=-1)
    return jnp.broadcast_to(grid[None], (b, h, w, 2))


def bilinear_sample(img, coords, return_mask=False):
    """Bilinear sampling with zeros padding and align_corners=True semantics
    (ref flow_utils.py:53-76). ``coords`` is (N, H, W, 2) in (i, j) pixel
    scale. Out-of-bounds corner taps contribute zero; the optional mask is
    1 where the sample point lies fully inside the image.

    Coordinate math runs in float32 regardless of ``img.dtype``: in bf16 a
    clipped upper bound like 511 rounds UP to 512 (out of range -> NaN
    gathers) and sub-pixel offsets quantize to ~0.5-2 px. Only the gathered
    values stay in the input dtype; the weighted sum accumulates in f32 and
    is cast back on return."""
    N, H, W, C = img.shape
    ci = coords[..., 0].astype(jnp.float32)
    cj = coords[..., 1].astype(jnp.float32)

    i0 = jnp.floor(ci)
    j0 = jnp.floor(cj)
    wi = ci - i0
    wj = cj - j0

    def tap(ii, jj, w):
        valid = ((ii >= 0) & (ii <= H - 1) & (jj >= 0) & (jj <= W - 1))
        iic = jnp.clip(ii, 0, H - 1).astype(jnp.int32)
        jjc = jnp.clip(jj, 0, W - 1).astype(jnp.int32)
        # gather per batch: use take_along_axis on flattened spatial dim
        flat = img.reshape(N, H * W, C)
        idx = (iic * W + jjc).reshape(N, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(N, *ii.shape[1:], C)
        return vals.astype(jnp.float32) * (w * valid)[..., None]

    out = (tap(i0, j0, (1 - wi) * (1 - wj))
           + tap(i0 + 1, j0, wi * (1 - wj))
           + tap(i0, j0 + 1, (1 - wi) * wj)
           + tap(i0 + 1, j0 + 1, wi * wj)).astype(img.dtype)

    if return_mask:
        mask = ((ci >= 0) & (ci <= H - 1) & (cj >= 0) & (cj <= W - 1))
        return out, mask
    return out


def flow_warp(feature, flow, mask=False):
    """Backward bilinear warp: out[i, j] = feature[i + di, j + dj]
    (ref flow_utils.py:79-86)."""
    b, h, w, _ = feature.shape
    grid = coords_grid(b, h, w) + flow.astype(jnp.float32)
    return bilinear_sample(feature, grid, return_mask=mask)


def flow_warp_nearest(img, bwd_flow):
    """Nearest-neighbour backward warp with clamped indices
    (ref flow_utils_np.py:15-36)."""
    N, H, W, C = img.shape
    i = jnp.arange(H)[None, :, None]
    j = jnp.arange(W)[None, None, :]
    pi = jnp.clip(jnp.round(i + bwd_flow[..., 0]), 0, H - 1).astype(jnp.int32)
    pj = jnp.clip(jnp.round(j + bwd_flow[..., 1]), 0, W - 1).astype(jnp.int32)
    flat = img.reshape(N, H * W, C)
    idx = (pi * W + pj).reshape(N, H * W, 1)
    return jnp.take_along_axis(flat, idx, axis=1).reshape(N, H, W, C)


def flow_warp_splat_nearest(img, fwd_flow, fwd_occ=None):
    """Nearest forward splat: res[round(i+di), round(j+dj)] += img[i, j]
    (ref flow_utils_np.py:39-62 / flow_utils.py alpha_warp path). Occluded
    source pixels (fwd_occ == 1) are dropped before splatting."""
    if fwd_occ is not None:
        img = img * (1 - fwd_occ)
    N, H, W, C = img.shape
    i = jnp.arange(H)[None, :, None]
    j = jnp.arange(W)[None, None, :]
    ti = jnp.clip(jnp.round(i + fwd_flow[..., 0]), 0, H - 1).astype(jnp.int32)
    tj = jnp.clip(jnp.round(j + fwd_flow[..., 1]), 0, W - 1).astype(jnp.int32)
    idx = (ti * W + tj).reshape(N, H * W)
    src = img.reshape(N, H * W, C)
    out = jnp.zeros_like(src)
    out = jax.vmap(lambda o, ix, s: o.at[ix].add(s))(out, idx, src)
    return out.reshape(N, H, W, C)


def get_intermediate_warp_mask(fwd_flow, fwd_occ, alpha):
    """Invert a forward flow into a backward flow by nearest splatting, and
    mark as occluded every target pixel hit != exactly once
    (ref flow_utils_np.py:65-103). Where the count is 1 the winning write is
    unique, so scatter order doesn't matter; where it is >1 the reference's
    value is order-defined but masked out as occluded anyway."""
    fwd_flow = fwd_flow * alpha
    N, H, W, _ = fwd_flow.shape
    i = jnp.arange(H)[None, :, None]
    j = jnp.arange(W)[None, None, :]
    ti = jnp.clip(jnp.round(i + fwd_flow[..., 0]), 0, H - 1).astype(jnp.int32)
    tj = jnp.clip(jnp.round(j + fwd_flow[..., 1]), 0, W - 1).astype(jnp.int32)
    idx = (ti * W + tj).reshape(N, H * W)

    keep = (fwd_occ[..., 0].reshape(N, H * W) == 0)

    cnt = jnp.zeros((N, H * W), jnp.int32)
    cnt = jax.vmap(lambda c, ix, k: c.at[ix].add(k.astype(jnp.int32)))(
        cnt, idx, keep)

    val = (-fwd_flow).reshape(N, H * W, 2) * keep[..., None]
    bwd = jnp.zeros((N, H * W, 2), fwd_flow.dtype)
    # masked scatter-set: drop occluded sources by routing them to a dummy
    # out-of-range index (mode='drop').
    idx_set = jnp.where(keep, idx, H * W)
    bwd = jax.vmap(
        lambda b, ix, v: b.at[ix].set(v, mode="drop")
    )(bwd, idx_set, val)

    bwd_occ = (cnt != 1).astype(fwd_occ.dtype).reshape(N, H, W, 1)
    return bwd.reshape(N, H, W, 2), bwd_occ


def forward_flow_warp(img, fwd_flow):
    """Bilinear forward splat with unnormalized corner weights; a target
    pixel is non-occluded iff any weight landed on it
    (ref flow_utils_np.py:106-161)."""
    N, H, W, C = img.shape
    i = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    j = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    ci = i + fwd_flow[..., 0].astype(jnp.float32)
    cj = j + fwd_flow[..., 1].astype(jnp.float32)
    # NOTE: the reference truncates toward zero (int(crt_i)), not floor;
    # flows that land at negative coords are out of bounds either way except
    # in (-1, 0), where truncation picks corners {0, 1} with weight
    # (1 - |c - corner|) — replicate with int-cast semantics.
    i1 = ci.astype(jnp.int32)
    j1 = cj.astype(jnp.int32)

    src = img.reshape(N, H * W, C).astype(jnp.float32)
    res = jnp.zeros((N, H * W, C), jnp.float32)
    cnt = jnp.zeros((N, H * W), jnp.float32)

    def corner(res, cnt, gi, gj):
        coef = (1 - jnp.abs(ci - gi)) * (1 - jnp.abs(cj - gj))
        valid = (gi >= 0) & (gi < H) & (gj >= 0) & (gj < W)
        coef = coef * valid.astype(jnp.float32)
        idx = jnp.where(valid, gi * W + gj, 0).reshape(N, H * W)
        coef = coef.reshape(N, H * W)
        res = jax.vmap(lambda r, ix, v: r.at[ix].add(v))(
            res, idx, src * coef[..., None])
        cnt = jax.vmap(lambda c, ix, v: c.at[ix].add(v))(cnt, idx, coef)
        return res, cnt

    for gi, gj in ((i1, j1), (i1 + 1, j1), (i1, j1 + 1), (i1 + 1, j1 + 1)):
        res, cnt = corner(res, cnt, gi, gj)

    bwd_occ = (cnt <= 0).astype(img.dtype).reshape(N, H, W, 1)
    return res.reshape(N, H, W, C).astype(img.dtype), bwd_occ


def forward_backward_consistency_check(fwd_flow, bwd_flow, alpha=0.01,
                                       beta=0.5):
    """UnFlow-style occlusion masks (ref flow_utils.py:133-153)."""
    flow_mag = (jnp.linalg.norm(fwd_flow, axis=-1)
                + jnp.linalg.norm(bwd_flow, axis=-1))
    warped_bwd = flow_warp(bwd_flow, fwd_flow)
    warped_fwd = flow_warp(fwd_flow, bwd_flow)
    diff_fwd = jnp.linalg.norm(fwd_flow + warped_bwd, axis=-1)
    diff_bwd = jnp.linalg.norm(bwd_flow + warped_fwd, axis=-1)
    threshold = alpha * flow_mag + beta
    fwd_occ = (diff_fwd > threshold).astype(fwd_flow.dtype)[..., None]
    bwd_occ = (diff_bwd > threshold).astype(bwd_flow.dtype)[..., None]
    return fwd_occ, bwd_occ


def upsample_noise(noise, ratio, key):
    """Variance-preserving noise upsample (ref flow_utils.py:204-211):
    draw hi-res z, subtract its per-patch mean, add nearest-upsampled
    noise / ratio. Each ratio x ratio patch then averages back to the
    original noise pixel / ratio (distribution-preserving)."""
    n, h, w, c = noise.shape
    z = jax.random.normal(key, (n, h * ratio, w * ratio, c), noise.dtype)
    zp = z.reshape(n, h, ratio, w, ratio, c)
    z_mean = zp.mean(axis=(2, 4), keepdims=True)
    z_centered = (zp - z_mean).reshape(n, h * ratio, w * ratio, c)
    x = jnp.repeat(jnp.repeat(noise, ratio, axis=1), ratio, axis=2)
    return x / ratio + z_centered


def collect_noise_pixel(noise, bwd_occ, sidelength, key):
    """Re-aggregate hi-res noise into low-res, refreshing occluded pixels
    with new gaussian noise (ref flow_utils.py:214-221)."""
    sl = sidelength
    n, h, w, c = noise.shape
    fresh = jax.random.normal(key, noise.shape, noise.dtype)
    res = fresh * bwd_occ + noise * (1 - bwd_occ)
    res = res.reshape(n, h // sl, sl, w // sl, sl, c)
    return res.sum(axis=(2, 4)) / sl


def continuous_noise_warp(high_res_noise, fwd_flow, fwd_occ, alpha, key,
                          noise_ratio=8):
    """Warp hi-res noise along a scaled forward flow, preserving the noise
    distribution (ref flow_utils.py:224-231)."""
    bwd_flow, bwd_occ = get_intermediate_warp_mask(fwd_flow, fwd_occ, alpha)
    warped = flow_warp(high_res_noise, bwd_flow)
    return collect_noise_pixel(warped, bwd_occ, noise_ratio, key)


def continuous_noise_warp_bwd(high_res_noise, bwd_flow, bwd_occ, key,
                              noise_ratio=8, flow_ratio=1):
    """ref flow_utils.py:234-239."""
    if flow_ratio != 1:
        bwd_flow = jax.image.resize(
            bwd_flow, (bwd_flow.shape[0], bwd_flow.shape[1] * flow_ratio,
                       bwd_flow.shape[2] * flow_ratio, 2), "nearest")
        bwd_occ = jax.image.resize(
            bwd_occ, (bwd_occ.shape[0], bwd_occ.shape[1] * flow_ratio,
                      bwd_occ.shape[2] * flow_ratio, 1), "nearest")
    warped = flow_warp(high_res_noise, bwd_flow)
    return collect_noise_pixel(warped, bwd_occ, noise_ratio, key)


def continuous_noise_fwd_warp(high_res_noise, fwd_flow, alpha, key,
                              noise_ratio=8):
    """ref flow_utils.py:262-267."""
    warped, bwd_occ = forward_flow_warp(high_res_noise, fwd_flow * alpha)
    return collect_noise_pixel(warped, bwd_occ, noise_ratio, key)


def forward_upsample_flow_warp(img, fwd_flow, scale=8):
    """Ideal-upsample then forward-splat then decimate
    (ref flow_utils.py:381-388)."""
    from ..ops.ideal_lpf import upsample_rfft
    up = upsample_rfft(img, up=scale)
    warped, occ = forward_flow_warp(up, fwd_flow)
    return warped[:, ::scale, ::scale, :], occ[:, ::scale, ::scale, :]


class InputPadder:
    """Pad images so dims are divisible by ``padding_factor``
    (ref flow_utils.py:10-31). NHWC, replicate padding."""

    def __init__(self, dims, mode="sintel", padding_factor=8):
        self.ht, self.wd = dims[1], dims[2]
        pad_ht = (((self.ht // padding_factor) + 1) * padding_factor
                  - self.ht) % padding_factor
        pad_wd = (((self.wd // padding_factor) + 1) * padding_factor
                  - self.wd) % padding_factor
        if mode == "sintel":
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2,
                         pad_ht // 2, pad_ht - pad_ht // 2]
        else:
            self._pad = [pad_wd // 2, pad_wd - pad_wd // 2, 0, pad_ht]

    def pad(self, *inputs):
        p = self._pad
        return [jnp.pad(x, ((0, 0), (p[2], p[3]), (p[0], p[1]), (0, 0)),
                        mode="edge") for x in inputs]

    def unpad(self, x):
        p = self._pad
        ht, wd = x.shape[1], x.shape[2]
        return x[:, p[2]: ht - p[3], p[0]: wd - p[1], :]


def flow_reverse_map(feature, flow):
    """Nearest gather along the flow (ref flow_utils.py:116-130, which
    misspells it flow_revserse_map)."""
    return flow_warp_nearest(feature, flow)


def flow_warp_with_occ_bg(key, img, flow, mask, is_randn, filter=None,
                          offsets=None):
    """Backward-warp and fill disocclusions with noise or a flat random
    color (ref flow_utils.py:89-113).

    The ``filter='lanczos'`` branch (reference: a constant-translation
    flow resampled with Lanczos taps) resolves its taps and slice bounds
    at trace time, so under ``jit`` the offsets must be static: pass
    ``offsets=(di, dj)`` in pixels. Outside jit they are read from
    ``flow[0, 0, 0]`` as the reference does."""
    if is_randn:
        background = jax.random.normal(key, img.shape, img.dtype)
    else:
        n, c = img.shape[0], img.shape[-1]
        background = jax.random.uniform(key, (n, 1, 1, c), img.dtype) * 2 - 1
    if filter == "lanczos":
        from .equivariance import apply_fractional_translation
        h, w = img.shape[1], img.shape[2]
        if offsets is None:
            if isinstance(flow, jax.core.Tracer):
                raise TypeError(
                    "flow_warp_with_occ_bg(filter='lanczos') under jit "
                    "needs static offsets=(di, dj) in pixels — the Lanczos "
                    "taps and slice bounds are resolved at trace time")
            offsets = (flow[0, 0, 0, 0], flow[0, 0, 0, 1])
        tx = -float(offsets[1]) / w
        ty = -float(offsets[0]) / h
        warped, _ = apply_fractional_translation(img, tx, ty)
    else:
        warped = flow_warp(img, flow)
    return warped * mask + background * (1 - mask)


def get_patch_moving_flow(img_template, region_box, displacement, alpha=1):
    """Synthetic backward flow moving one rectangular patch
    (ref flow_utils.py:242-259)."""
    n, h, w, _ = img_template.shape
    u, d, l, r = region_box
    di, dj = displacement
    bwd_flow = np.zeros((n, h, w, 2), np.float32)
    bwd_occ = np.zeros((n, h, w, 1), np.float32)
    bwd_occ[:, u:d, l:r] = 1.0
    u2 = int(np.round(u + di * alpha))
    d2 = int(np.round(d + di * alpha))
    l2 = int(np.round(l + dj * alpha))
    r2 = int(np.round(r + dj * alpha))
    bwd_flow[:, u2:d2, l2:r2, 0] = -di * alpha
    bwd_flow[:, u2:d2, l2:r2, 1] = -dj * alpha
    bwd_occ[:, u2:d2, l2:r2] = 0.0
    return jnp.asarray(bwd_flow), jnp.asarray(bwd_occ)


def noise_image_random_translate(key, img, noise, max_offset_i, max_offset_j,
                                 noise_upsample=True, batch_size=1,
                                 int_offset=False):
    """Jointly translate an image and its (lower-res) noise while keeping
    the noise distribution intact (ref flow_utils.py:347-378)."""
    n, h, w, _ = img.shape
    n2, h2, w2, _ = noise.shape
    assert n == n2 and h * w2 == w * h2
    ratio = h // h2
    img = jnp.tile(img, (batch_size, 1, 1, 1))
    noise = jnp.tile(noise, (batch_size, 1, 1, 1))
    n = n * batch_size

    from .shifters import gen_random_offset
    k_off, k_bg, k_noise, k_col = jax.random.split(key, 4)
    ti, tj = gen_random_offset(k_off, max_offset_i, max_offset_j,
                               int_offset, 1)
    ti, tj = ti[0], tj[0]
    bwd_flow = jnp.broadcast_to(jnp.stack([-ti, -tj]).reshape(1, 1, 1, 2),
                                (n, h, w, 2))
    warped_img, bwd_mask = flow_warp(img, bwd_flow, True)
    bwd_mask = bwd_mask[..., None].astype(jnp.float32)
    bg = jax.random.uniform(k_bg, (n, 1, 1, img.shape[-1]), img.dtype) * 2 - 1
    warped_img = warped_img * bwd_mask + bg * (1 - bwd_mask)

    if noise_upsample:
        hi = upsample_noise(noise, ratio, k_noise)
        warped_noise = continuous_noise_warp_bwd(
            hi, bwd_flow, 1 - bwd_mask, k_col, noise_ratio=ratio)
    else:
        noise_flow = bwd_flow[:, ::ratio, ::ratio, :] / ratio
        noise_mask = bwd_mask[:, ::ratio, ::ratio, :]
        warped_noise = flow_warp_with_occ_bg(k_col, noise, noise_flow,
                                             noise_mask, True)
    return warped_img, warped_noise


# -- flow-model-coupled wrappers (ref flow_utils.py:156-203) ----------------
# ``flow_fn(img0, img1) -> (fwd, fwd_occ, bwd, bwd_occ)`` is this repo's
# bidirectional-flow interface (models.gmflow.make_gmflow_flow_fn or
# shift.simple_flow); flows are NHWC (di, dj) throughout — the reference's
# channel flip of bwd_flow (flow_utils.py:176) is an (dx, dy) <-> (dy, dx)
# conversion this convention never needs.


def predict_flow(flow_fn, image1, image2, padding_factor=8):
    """Pad to a multiple of ``padding_factor``, run the flow model both
    ways, unpad, and recompute UnFlow occlusions on the unpadded flows
    (ref flow_utils.py:181-193, whose first argument is likewise the
    flow model). For the model-free LK estimator with signature
    (img0, img1), use shift.simple_flow.predict_flow."""
    if not callable(flow_fn):
        raise TypeError(
            "predict_flow(flow_fn, image1, image2) takes a bidirectional "
            "flow callable first (reference signature, flow_utils.py:181); "
            "for direct image-pair LK flow use "
            "shift.simple_flow.predict_flow(img0, img1)")
    padder = InputPadder(image1.shape, padding_factor=padding_factor)
    im1, im2 = padder.pad(image1, image2)
    fwd, _, bwd, _ = flow_fn(im1, im2)
    fwd, bwd = padder.unpad(fwd), padder.unpad(bwd)
    fwd_occ, bwd_occ = forward_backward_consistency_check(fwd, bwd)
    return fwd, fwd_occ, bwd, bwd_occ


def get_warped_and_mask(flow_fn, image1, image2, image3=None,
                        pixel_consistency=False):
    """Backward-warp ``image3`` (default: image1) along the 2->1 flow and
    return it with the backward occlusion mask and flow
    (ref flow_utils.py:156-178; beta=1 occlusion threshold)."""
    if image3 is None:
        image3 = image1
    padder = InputPadder(image1.shape, padding_factor=16)
    im1, im2 = padder.pad(image1, image2)
    fwd, _, bwd, _ = flow_fn(im1, im2)
    fwd, bwd = padder.unpad(fwd), padder.unpad(bwd)
    fwd_occ, bwd_occ = forward_backward_consistency_check(fwd, bwd, beta=1)
    if pixel_consistency:
        warped_image1 = flow_warp(image1, bwd)
        # the reference thresholds at a quarter of its 0-255 pixel range
        # (flow_utils.py:172); this repo's images are [-1, 1] (range 2.0)
        drift = (jnp.abs(image2 - warped_image1).mean(
            axis=-1, keepdims=True) > 0.25 * 2.0).astype(bwd_occ.dtype)
        bwd_occ = jnp.clip(bwd_occ + drift, 0, 1)
    return flow_warp(image3, bwd), bwd_occ, bwd


def alpha_warp(flow_fn, image1, image2, alpha):
    """Forward-splat image1 a fraction ``alpha`` of the way toward image2
    (ref flow_utils.py:197-203)."""
    fwd, fwd_occ, bwd, bwd_occ = predict_flow(flow_fn, image1, image2)
    warped = flow_warp_splat_nearest(image1, fwd * alpha, fwd_occ)
    return warped, fwd, fwd_occ, bwd, bwd_occ
