"""Built-in optical flow: coarse-to-fine iterative Lucas-Kanade, pure jnp.

The reference's interpolation pipeline drives a GMFlow transformer
(a git submodule + downloaded checkpoint, image_interpolation_pipeline.py:
178-191) — unavailable in a zero-egress build. This classical pyramidal
estimator exposes the same interface as the reference's ``predict_flow``
(flow_utils.py:181-193): bidirectional flow + UnFlow occlusion masks. Any
learned estimator with the same signature can be plugged into
``ImageInterpolationPipeline(flow_fn=...)``.

Flow convention: (N, H, W, 2) with last axis (di, dj)."""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .flow import flow_warp, forward_backward_consistency_check


def _gray(img):
    """[-1,1] RGB NHWC -> single channel."""
    if img.shape[-1] == 1:
        return img
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def _box_filter(x, r):
    k = 2 * r + 1
    kern = jnp.ones((k, k, 1, 1), x.dtype) / (k * k)
    C = x.shape[-1]
    kern = jnp.broadcast_to(kern, (k, k, 1, C))
    return lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)


def _down2(x):
    return _box_filter(x, 1)[:, ::2, ::2, :]


def _grad(x):
    gy = (jnp.roll(x, -1, axis=1) - jnp.roll(x, 1, axis=1)) * 0.5
    gx = (jnp.roll(x, -1, axis=2) - jnp.roll(x, 1, axis=2)) * 0.5
    return gy, gx


def _lk_refine(i0, i1, flow, radius=3, iters=3, eps=1e-3):
    """Iterative LK at one pyramid level."""
    def body(flow, _):
        warped = flow_warp(i1, flow)
        iy, ix = _grad(warped)
        it = warped - i0
        # structure tensor, window-averaged
        a11 = _box_filter(iy * iy, radius) + eps
        a12 = _box_filter(iy * ix, radius)
        a22 = _box_filter(ix * ix, radius) + eps
        b1 = _box_filter(iy * it, radius)
        b2 = _box_filter(ix * it, radius)
        det = a11 * a22 - a12 * a12
        di = (-(a22 * b1 - a12 * b2) / det).mean(-1, keepdims=True)
        dj = (-(a11 * b2 - a12 * b1) / det).mean(-1, keepdims=True)
        upd = jnp.clip(jnp.concatenate([di, dj], -1), -2.0, 2.0)
        return flow + upd, None
    flow, _ = lax.scan(body, flow, None, length=iters)
    return flow


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def estimate_flow(img0, img1, levels=4, radius=3, iters=5):
    """Forward flow img0 -> img1, (N, H, W, 2) in pixels."""
    g0 = _gray(img0.astype(jnp.float32))
    g1 = _gray(img1.astype(jnp.float32))
    pyr = [(g0, g1)]
    for _ in range(levels - 1):
        g0, g1 = _down2(g0), _down2(g1)
        pyr.append((g0, g1))

    n = img0.shape[0]
    h, w = pyr[-1][0].shape[1:3]
    flow = jnp.zeros((n, h, w, 2), jnp.float32)
    for (l0, l1) in reversed(pyr):
        if flow.shape[1] != l0.shape[1]:
            flow = 2.0 * jax.image.resize(
                flow, (n, l0.shape[1], l0.shape[2], 2), "bilinear")
        flow = _lk_refine(l0, l1, flow, radius=radius, iters=iters)
        # regularize: flat (aperture-limited) regions inherit their
        # neighborhood's motion
        flow = _box_filter(flow, 2)
    return flow


@partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def predict_flow(img0, img1, levels=4, radius=3, iters=5):
    """Bidirectional flow + occlusions, the reference ``predict_flow``
    interface (flow_utils.py:181-193). Fully jitted (the TPU runtime has no
    eager dispatch)."""
    fwd = estimate_flow(img0, img1, levels=levels, radius=radius,
                        iters=iters)
    bwd = estimate_flow(img1, img0, levels=levels, radius=radius,
                        iters=iters)
    fwd_occ, bwd_occ = forward_backward_consistency_check(fwd, bwd)
    return fwd, fwd_occ, bwd, bwd_occ
