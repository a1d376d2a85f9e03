"""Tests for the remaining flow-utility parity surface."""

import numpy as np
import jax
import jax.numpy as jnp

from afldm_tpu.shift import (InputPadder, flow_reverse_map,
                             flow_warp_with_occ_bg, get_patch_moving_flow,
                             noise_image_random_translate,
                             flow_warp_splat_nearest)
from afldm_tpu.ops import conv2d_resample, setup_filter
from afldm_tpu.ops.bias_act import fma
from afldm_tpu.shift.shifters import LearnedUpsampler


def test_input_padder_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 30, 37, 3)), jnp.float32)
    p = InputPadder(x.shape, padding_factor=8)
    (xp,) = p.pad(x)
    assert xp.shape[1] % 8 == 0 and xp.shape[2] % 8 == 0
    back = p.unpad(xp)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_flow_reverse_map_identity(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 2)), jnp.float32)
    got = flow_reverse_map(x, jnp.zeros((1, 6, 6, 2)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(x))


def test_flow_warp_with_occ_bg_fills(rng):
    x = jnp.ones((1, 8, 8, 3))
    mask = jnp.zeros((1, 8, 8, 1))  # everything occluded
    out = flow_warp_with_occ_bg(jax.random.PRNGKey(0), x,
                                jnp.zeros((1, 8, 8, 2)), mask,
                                is_randn=False)
    o = np.asarray(out)
    assert np.allclose(o[0, :, :, 0], o[0, 0, 0, 0])  # flat color


def test_get_patch_moving_flow():
    img = jnp.zeros((1, 16, 16, 3))
    flow, occ = get_patch_moving_flow(img, (2, 6, 2, 6), (4, 0), alpha=1)
    f = np.asarray(flow)
    o = np.asarray(occ)
    assert np.allclose(f[0, 6:10, 2:6, 0], -4)
    assert o[0, 2:6, 2:6].max() == 1.0  # vacated region occluded
    assert o[0, 6:10, 2:6].max() == 0.0  # destination valid


def test_noise_image_random_translate(rng):
    img = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    wi, wn = noise_image_random_translate(jax.random.PRNGKey(1), img, noise,
                                          4, 4, noise_upsample=True)
    assert wi.shape == img.shape and wn.shape == noise.shape
    # translated noise stays ~unit variance (distribution-preserving)
    assert abs(float(jnp.var(wn)) - 1.0) < 0.35


def test_splat_nearest_conserves_mass(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 1)), jnp.float32)
    flow = jnp.ones((1, 8, 8, 2)) * 1.4  # all move (1,1) after rounding
    out = flow_warp_splat_nearest(x, flow)
    np.testing.assert_allclose(float(out.sum()), float(x.sum()), rtol=1e-5)


def test_conv2d_resample_matches_composition(rng):
    """Reference semantics (conv2d_resample.py:92-140): pad once relative
    to the upsampled image with filter-size adjustments, then
    up-FIR -> conv -> FIR-down."""
    from afldm_tpu.ops import upfirdn2d as _upfirdn2d
    from jax import lax
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)), jnp.float32)
    f = setup_filter([1, 3, 3, 1], separable=False)
    up = down = 2
    fw = fh = 4
    got = conv2d_resample(x, w, f, up=up, down=down, padding=1)
    px0 = 1 + (fw + up - 1) // 2 + (fw - down + 1) // 2
    px1 = 1 + (fw - up) // 2 + (fw - down) // 2
    hi = _upfirdn2d(x, f, up=up, padding=(px0, px1, px0, px1), gain=up ** 2)
    mid = lax.conv_general_dilated(hi, w, (1, 1), ((0, 0), (0, 0)),
                                   dimension_numbers=("NHWC", "HWIO",
                                                      "NHWC"))
    want = _upfirdn2d(mid, f, down=down)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fma():
    np.testing.assert_allclose(
        np.asarray(fma(jnp.asarray(2.0), jnp.asarray(3.0),
                       jnp.asarray(4.0))), 10.0)


def test_learned_upsampler(rng):
    up = LearnedUpsampler(scale=2)
    params = up.init_params()
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    y = up.upsample(params, x)
    assert y.shape == (1, 16, 16, 3)
    # blur-kernel init approximately preserves the mean
    assert abs(float(y.mean()) - float(x.mean())) < 0.2


def test_upsample_pad_zero_matches_reference(rng):
    import torch
    from _reference import import_reference
    ref_upz = import_reference().shifters.upsample_pad_zero
    from afldm_tpu.shift import upsample_pad_zero

    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ref = ref_upz(torch.from_numpy(x).permute(0, 3, 1, 2), 3)
    got = upsample_pad_zero(jnp.asarray(x), 3)
    np.testing.assert_allclose(
        np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), atol=0)


def _const_flow_fn(di, dj):
    def fn(a, b):
        n, h, w, _ = a.shape
        fwd = jnp.broadcast_to(jnp.asarray([di, dj], jnp.float32),
                               (n, h, w, 2))
        z = jnp.zeros((n, h, w, 1), jnp.float32)
        return fwd, z, -fwd, z
    return fn


def test_predict_flow_wrapper_pads_and_unpads(rng):
    from afldm_tpu.shift import predict_flow
    img = jnp.asarray(rng.standard_normal((1, 30, 37, 3)), jnp.float32)
    fwd, fwd_occ, bwd, bwd_occ = predict_flow(_const_flow_fn(1.0, -2.0),
                                              img, img)
    assert fwd.shape == (1, 30, 37, 2) and fwd_occ.shape == (1, 30, 37, 1)
    np.testing.assert_allclose(np.asarray(fwd[..., 0]), 1.0)
    np.testing.assert_allclose(np.asarray(bwd[..., 1]), 2.0)
    # consistent fwd/bwd pair -> interior is unoccluded (the zeros-pad
    # backward warp marks a border band, as the reference's would)
    assert float(fwd_occ[:, 4:-4, 4:-4].sum()) == 0.0
    assert float(bwd_occ[:, 4:-4, 4:-4].sum()) == 0.0


def test_get_warped_and_mask_integer_shift(rng):
    from afldm_tpu.shift import get_warped_and_mask
    from afldm_tpu.shift import flow_warp
    img1 = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    img2 = jnp.roll(img1, 2, axis=2)
    fn = _const_flow_fn(0.0, 2.0)   # fwd: each pixel moves +2 columns
    warped, bwd_occ, bwd = get_warped_and_mask(fn, img1, img2)
    np.testing.assert_allclose(np.asarray(bwd[..., 1]), -2.0)
    ref = flow_warp(img1, bwd)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(ref))
    # pixel-consistency flag only ever grows the occlusion mask, and a
    # photometrically inconsistent pair (mean |diff| > quarter of the
    # [-1, 1] range) must actually trigger it
    _, occ2, _ = get_warped_and_mask(fn, img1, img2,
                                     pixel_consistency=True)
    assert float((occ2 - bwd_occ).min()) >= 0.0
    _, occ3, _ = get_warped_and_mask(fn, img1, img2 + 1.5,
                                     pixel_consistency=True)
    np.testing.assert_allclose(np.asarray(occ3), 1.0)


def test_alpha_warp_moves_mass(rng):
    from afldm_tpu.shift import alpha_warp
    img = jnp.zeros((1, 16, 16, 1)).at[0, 4, 4, 0].set(1.0)
    warped, fwd, fwd_occ, bwd, bwd_occ = alpha_warp(
        _const_flow_fn(4.0, 0.0), img, img, alpha=0.5)
    # the unit mass moved by round(4 * 0.5) = 2 rows
    assert float(warped[0, 6, 4, 0]) == 1.0
    assert float(warped.sum()) == 1.0


def test_flow_warp_bf16_no_nan_and_subpixel(rng):
    """r4 review: coordinates downcast to bf16 rounded the clip bound
    H-1=511 up to 512 (out-of-range gathers -> NaN rows) and quantized
    sub-pixel offsets by up to 2 px. Coordinate math must stay f32."""
    from afldm_tpu.shift import flow_warp
    x32 = jnp.asarray(rng.standard_normal((1, 512, 512, 1)), jnp.float32)
    flow = jnp.full((1, 512, 512, 2), 0.5, jnp.float32)
    ref = np.asarray(flow_warp(x32, flow))
    got = np.asarray(flow_warp(x32.astype(jnp.bfloat16), flow))
    assert got.dtype == np.dtype("bfloat16") or str(got.dtype) == "bfloat16"
    assert np.isfinite(got.astype(np.float32)).all()
    np.testing.assert_allclose(got.astype(np.float32), ref, atol=0.15)


def test_flow_warp_with_occ_bg_lanczos(rng):
    from afldm_tpu.shift import flow_warp_with_occ_bg
    from afldm_tpu.shift.equivariance import apply_fractional_translation
    import pytest
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 3)), jnp.float32)
    mask = jnp.ones((1, 16, 16, 1))
    flow = jnp.full((1, 16, 16, 2), 1.25, jnp.float32)
    key = jax.random.PRNGKey(0)
    # eager: offsets read from the flow, must equal the explicit-offsets call
    out1 = flow_warp_with_occ_bg(key, x, flow, mask, True, filter="lanczos")
    out2 = flow_warp_with_occ_bg(key, x, flow, mask, True, filter="lanczos",
                                 offsets=(1.25, 1.25))
    want, _ = apply_fractional_translation(x, -1.25 / 16, -1.25 / 16)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(want), atol=1e-5)
    # under jit: a traced flow without static offsets must raise loudly
    jitted = jax.jit(lambda k, a, f, m: flow_warp_with_occ_bg(
        k, a, f, m, True, filter="lanczos"))
    with pytest.raises(TypeError, match="static offsets"):
        jitted(key, x, flow, mask)
    # ... and with static offsets it works under jit
    jitted2 = jax.jit(lambda k, a, f, m: flow_warp_with_occ_bg(
        k, a, f, m, True, filter="lanczos", offsets=(1.25, 1.25)))
    np.testing.assert_allclose(np.asarray(jitted2(key, x, flow, mask)),
                               np.asarray(out2), atol=1e-5)


def test_equivariance_metrics_process_allreduce(rng):
    """The axis_name seam must work on a host loop: it all-reduces across
    JAX processes (single process here -> identity), not via an unbound
    collective axis (which raised NameError before r4)."""
    from afldm_tpu.shift.equivariance import compute_equivariance_metrics

    def generate_fn(key, M):
        img = jax.random.normal(key, (2, 16, 16, 3))
        di, dj = -M[1, 2] * 16, -M[0, 2] * 16
        return jnp.roll(img, (int(round(float(di))), int(round(float(dj)))),
                        axis=(1, 2))

    psnr_local = compute_equivariance_metrics(
        generate_fn, jax.random.PRNGKey(0), 4, 2, 16, compute_eqt_int=True)
    psnr_reduced = compute_equivariance_metrics(
        generate_fn, jax.random.PRNGKey(0), 4, 2, 16, compute_eqt_int=True,
        axis_name="data")
    np.testing.assert_allclose(psnr_local, psnr_reduced, rtol=1e-6)


def test_conv2d_resample_preserves_bf16(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 5)), jnp.bfloat16)
    f = setup_filter([1, 3, 3, 1], separable=False)
    out = conv2d_resample(x, w, f, up=2, down=2, padding=1)
    assert out.dtype == jnp.bfloat16
