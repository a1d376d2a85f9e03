"""Tests for shifters, flow warps, and metrics (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.ops import lpf_rfft
from afldm_tpu.shift import (
    ImageShifter, BgType, gen_valid_mask, gen_random_offset,
    fourier_shift_batch, mask_mse, mask_psnr, psnr,
    flow_warp, flow_warp_nearest, forward_flow_warp,
    get_intermediate_warp_mask, forward_backward_consistency_check,
    upsample_noise, collect_noise_pixel,
)


def _rand(rng, n=1, h=16, w=16, c=3):
    return jnp.asarray(rng.standard_normal((n, h, w, c)), dtype=jnp.float32)


# --- metrics -----------------------------------------------------------------

def test_mask_mse_full_mask_equals_mse(rng):
    a, b = _rand(rng), _rand(rng)
    m = jnp.ones_like(a)
    got = mask_mse(a, b, m)
    np.testing.assert_allclose(got, np.mean((np.asarray(a) - np.asarray(b)) ** 2),
                               rtol=1e-5)


def test_psnr_known_value():
    a = jnp.zeros((1, 4, 4, 1))
    b = jnp.ones((1, 4, 4, 1)) * 0.1
    # i_max = 0.1, mse = 0.01 -> psnr = 0
    np.testing.assert_allclose(psnr(a, b), 0.0, atol=1e-5)


def test_mask_psnr_ignores_masked_region(rng):
    a = _rand(rng)
    b = a.at[:, :2, :, :].add(100.0)  # corrupt only rows 0-1
    m = jnp.ones_like(a).at[:, :2, :, :].set(0.0)
    assert float(mask_psnr(a, b, m)) > 60.0


# --- gen_valid_mask / offsets ------------------------------------------------

@pytest.mark.parametrize("ti,tj", [(3, 0), (-2, 5), (0.5, -1.25), (0, 0)])
def test_gen_valid_mask_matches_reference_rule(ti, tj):
    shape = (1, 8, 10, 1)
    got = np.asarray(gen_valid_mask(shape, ti, tj))[0, :, :, 0]

    # reference rule (shifters.py:31-49)
    h, w = 8, 10
    want = np.ones((h, w), np.float32)
    if ti >= 0:
        want[: int(np.ceil(ti)), :] = 0
    else:
        want[int(np.floor(ti)):, :] = 0
    if tj >= 0:
        want[:, : int(np.ceil(tj))] = 0
    else:
        want[:, int(np.floor(tj)):] = 0
    np.testing.assert_array_equal(got, want)


def test_gen_random_offset_int_grid():
    key = jax.random.PRNGKey(0)
    oi, oj = gen_random_offset(key, 8, 8, int_offset=True, int_stride=2,
                               bs=64)
    oi, oj = np.asarray(oi), np.asarray(oj)
    assert np.all(oi % 2 == 0) and np.all(np.abs(oi) <= 8)
    assert np.all(oj % 2 == 0) and np.all(np.abs(oj) <= 8)


# --- flow warps --------------------------------------------------------------

def test_flow_warp_integer_shift_equals_slice(rng):
    x = _rand(rng, h=8, w=8)
    flow = jnp.ones((1, 8, 8, 2)) * jnp.asarray([2.0, 0.0])  # di=2
    y, mask = flow_warp(x, flow, True)
    # out[i, j] = x[i+2, j] where valid
    np.testing.assert_allclose(np.asarray(y)[0, :6], np.asarray(x)[0, 2:],
                               atol=1e-6)
    assert np.asarray(mask)[0, :6].all() and not np.asarray(mask)[0, 6:].any()


def test_flow_warp_nearest_matches_reference_loop(rng):
    x = _rand(rng, h=6, w=6, c=2)
    flow = jnp.asarray(rng.uniform(-3, 3, (1, 6, 6, 2)), jnp.float32)
    got = np.asarray(flow_warp_nearest(x, flow))
    xn = np.asarray(x)
    fn = np.asarray(flow)
    want = np.zeros_like(xn)
    for i in range(6):
        for j in range(6):
            pi = int(np.clip(np.round(i + fn[0, i, j, 0]), 0, 5))
            pj = int(np.clip(np.round(j + fn[0, i, j, 1]), 0, 5))
            want[0, i, j] = xn[0, pi, pj]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_forward_flow_warp_matches_reference_loop(rng):
    """Bilinear splat vs the numba kernel's algorithm
    (flow_utils_np.py:106-152) transcribed in python."""
    n, h, w, c = 1, 6, 6, 2
    x = _rand(rng, n=n, h=h, w=w, c=c)
    flow = jnp.asarray(rng.uniform(-2, 2, (n, h, w, 2)), jnp.float32)
    got, got_occ = forward_flow_warp(x, flow)

    xn = np.asarray(x)
    fn = np.asarray(flow)
    res = np.zeros_like(xn)
    cnt = np.zeros((n, h, w))
    for i in range(h):
        for j in range(w):
            ci = i + fn[0, i, j, 0]
            cj = j + fn[0, i, j, 1]
            i1, j1 = int(ci), int(cj)
            for gi, gj in ((i1, j1), (i1 + 1, j1), (i1, j1 + 1),
                           (i1 + 1, j1 + 1)):
                if 0 <= gi < h and 0 <= gj < w:
                    coef = (1 - abs(ci - gi)) * (1 - abs(cj - gj))
                    cnt[0, gi, gj] += coef
                    res[0, gi, gj] += xn[0, i, j] * coef
    occ = (cnt <= 0).astype(np.float32)[..., None]
    np.testing.assert_allclose(np.asarray(got), res, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_occ), occ, atol=1e-6)


def test_get_intermediate_warp_mask_counts(rng):
    n, h, w = 1, 6, 6
    flow = jnp.zeros((n, h, w, 2))
    # two sources map to (2, 2): (2,2) itself (flow 0) and (1,2) with di=1
    flow = flow.at[0, 1, 2, 0].set(1.0)
    occ = jnp.zeros((n, h, w, 1))
    bwd_flow, bwd_occ = get_intermediate_warp_mask(flow, occ, 1.0)
    bo = np.asarray(bwd_occ)[0, :, :, 0]
    assert bo[2, 2] == 1.0   # hit twice -> occluded
    assert bo[1, 2] == 1.0   # hit zero times -> occluded
    assert bo[0, 0] == 0.0   # hit exactly once
    np.testing.assert_allclose(np.asarray(bwd_flow)[0, 0, 0], [0, 0])


def test_consistency_check_zero_flow():
    fwd = jnp.zeros((1, 8, 8, 2))
    bwd = jnp.zeros((1, 8, 8, 2))
    fo, bo = forward_backward_consistency_check(fwd, bwd)
    assert not np.asarray(fo).any() and not np.asarray(bo).any()


def test_upsample_noise_statistics():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, (4, 8, 8, 4))
    up = upsample_noise(noise, 4, k2)
    assert up.shape == (4, 32, 32, 4)
    # variance stays ~1 and per-patch mean equals noise / ratio
    assert abs(float(jnp.var(up)) - 1.0) < 0.1
    patch_mean = up.reshape(4, 8, 4, 8, 4, 4).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(patch_mean),
                               np.asarray(noise) / 4, atol=1e-5)


def test_collect_noise_pixel_inverts_upsample():
    key = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(key, 3)
    noise = jax.random.normal(k1, (2, 8, 8, 4))
    up = upsample_noise(noise, 4, k2)
    occ = jnp.zeros((2, 32, 32, 1))
    back = collect_noise_pixel(up, occ, 4, k3)
    np.testing.assert_allclose(np.asarray(back), np.asarray(noise), atol=1e-4)


# --- ImageShifter ------------------------------------------------------------

def test_ideal_shift_integer_is_roll(rng):
    x = lpf_rfft(_rand(rng, h=16, w=16), 0.5)
    sh = ImageShifter("ideal", upsample_ratio=8)
    y, _ = sh.shift(x, 0, 1)  # integer shift of 1 px
    # roll of the band-limited signal (ideal interp is exact for int shifts)
    np.testing.assert_allclose(np.asarray(y), np.asarray(jnp.roll(x, 1, axis=2)),
                               atol=1e-4)


def test_ideal_crop_mask(rng):
    x = _rand(rng, h=16, w=16)
    sh = ImageShifter("ideal_crop", upsample_ratio=8)
    y, m = sh.shift(x, 0, 2.5)
    m = np.asarray(m)
    assert m[0, :, :3, :].sum() == 0 and m[0, :, 3:, :].all()


def test_fourier_vs_ideal_on_bandlimited(rng):
    """On a Nyquist-free signal the ideal (up-roll-down) shift equals the
    Fourier phase shift."""
    x = lpf_rfft(_rand(rng, h=16, w=16), 0.5)
    sh_i = ImageShifter("ideal", upsample_ratio=8)
    yi, _ = sh_i.shift(x, 0, 0.5)
    yf = fourier_shift_batch(x, 0, 0.5)
    np.testing.assert_allclose(np.asarray(yi), np.asarray(yf), atol=1e-4)


def test_bilinear_shift_half_pixel_average(rng):
    x = _rand(rng, h=8, w=8)
    sh = ImageShifter()  # bilinear
    y, m = sh.shift(x, 0, -0.5)
    xn = np.asarray(x)
    # out[i,j] = x[i, j+0.5] bilinear = avg of j, j+1
    want = 0.5 * (xn[0, :, :-1] + xn[0, :, 1:])
    np.testing.assert_allclose(np.asarray(y)[0, :, :-1], want, atol=1e-5)


def test_translate_with_occ_bg_fills_background(rng):
    x = _rand(rng, h=8, w=8)
    sh = ImageShifter("ideal_crop", upsample_ratio=8)
    key = jax.random.PRNGKey(0)
    y, m = sh.translate_with_occ_bg(key, x, 0, 3, BgType.FULL_COLOR,
                                    return_mask=True)
    y = np.asarray(y)
    # masked-out columns are a constant per-channel color
    assert np.allclose(y[0, :, 0, 0], y[0, 0, 0, 0])


def test_shift_with_traced_offsets(rng):
    """Offsets must be jit-traceable (training shift loss)."""
    x = _rand(rng, h=16, w=16)
    sh = ImageShifter("ideal_crop", upsample_ratio=8)
    cache = sh.precompute(x)

    @jax.jit
    def f(c, ti, tj):
        return sh.shift(x, ti, tj, cache=c)

    y1, m1 = f(cache, jnp.float32(0.0), jnp.float32(1.0))
    y2, m2 = sh.shift(x, 0, 1)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_lanczos_shift_close_to_ideal_in_valid_region(rng):
    x = lpf_rfft(_rand(rng, h=32, w=32), 0.5)
    sh_l = ImageShifter("lanczos")
    sh_i = ImageShifter("ideal", upsample_ratio=8)
    yl, ml = sh_l.shift(x, 0.0, 0.5)
    yi, _ = sh_i.shift(x, 0.0, 0.5)
    err = np.abs(np.asarray((yl - yi) * ml)).mean()
    base = np.abs(np.asarray(yi * ml)).mean()
    assert err < 0.1 * base


def test_image_downsampler_ideal_roundtrip():
    """Regression for the deliberate fix of the reference's broken ideal
    cutoff (ref shifters.py:347 passes `scale` where 1/scale is intended;
    see ImageDownsampler docstring): ideal downsample of a bandlimited
    signal then ideal upsample must be (near-)identity. With the
    reference's broken no-op mask the decimation aliases and the roundtrip
    error is O(1)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from afldm_tpu.shift.shifters import ImageDownsampler, ImageUpsampler
    from afldm_tpu.ops.ideal_lpf import lpf_rfft

    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((1, 32, 32, 2)), jnp.float32)
    # bandlimit to below the post-decimation Nyquist (cutoff 1/2 of the
    # 2x-decimated grid = 1/4 of the original)
    x = lpf_rfft(x, cutoff=0.25)

    down = ImageDownsampler(scale=2, mode="ideal")
    up = ImageUpsampler(scale=2, mode="ideal")
    y = down.downsample(x)
    assert y.shape == (1, 16, 16, 2)
    z = up.upsample(y)
    np.testing.assert_allclose(np.asarray(z), np.asarray(x), atol=1e-4)

    # energy preserved through the decimation (no aliased fold-back)
    e_hi = float((np.asarray(x) ** 2).mean())
    e_lo = float((np.asarray(y) ** 2).mean())
    assert abs(e_hi - e_lo) / e_hi < 1e-3


@pytest.mark.parametrize("k", [1, 8, 9, 16])
def test_shift_eval_mask_overhang(k, rng):
    """The k=8->9 cliff mechanism in the flagship shift eval (BENCH_NOTES
    round-5 analyses, scripts/diag_shift_cliff.py): an ideal_crop latent
    shift of k/8 pixels zeroes ceil(k/8) latent columns = 8*ceil(k/8)
    image pixels, while the eval's image-space PSNR mask only excludes k
    pixels — the 8*ceil(k/8) - k overhang decodes from zeroed latents and
    is scored. Pins the mask widths the diagnosis rests on."""
    import math
    d = 8
    lat = jnp.asarray(rng.standard_normal((1, 16, 16, 4)), jnp.float32)
    sh = ImageShifter("ideal_crop", upsample_ratio=d)
    _, lat_mask = jax.jit(lambda z: sh.shift(z, 0.0, k / d))(lat)
    zero_cols = int((np.asarray(lat_mask)[0, 0, :, 0] == 0).sum())
    assert zero_cols == math.ceil(k / d)

    img = jnp.asarray(rng.standard_normal((1, 128, 128, 3)), jnp.float32)
    _, img_mask = jax.jit(lambda x: ImageShifter().shift(x, 0.0,
                                                         float(k)))(img)
    zero_px = int((np.asarray(img_mask)[0, 64, :, 0] < 0.5).sum())
    assert zero_px == k
    overhang = d * math.ceil(k / d) - k
    assert overhang == {1: 7, 8: 0, 9: 7, 16: 0}[k]
