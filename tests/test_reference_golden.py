"""Golden tests: afldm_tpu ops vs the ACTUAL reference code at
/root/reference (imported through tests/_reference.py shims and run on its
torch CPU paths). These anchor numerical parity to the reference's own
implementation rather than a transcription of it (VERDICT round 1, item 2).

Layout note: the reference is NCHW, afldm_tpu is NHWC; every comparison
transposes at the boundary. The reference's LPF classes build square masks
from the last axis only, so direct LPF comparisons use square inputs;
non-square coverage goes through upfirdn2d / shifter / flow paths which the
reference supports.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests._reference import reference_available, import_reference

if not reference_available():  # pragma: no cover
    pytest.skip("/root/reference not present", allow_module_level=True)

torch = pytest.importorskip("torch")
REF = import_reference()

import importlib

import afldm_tpu.ops.ideal_lpf as lpf

# afldm_tpu.ops.__init__ rebinds the name "upfirdn2d" to the function, so a
# plain "import afldm_tpu.ops.upfirdn2d as uf" would resolve to the function.
uf = importlib.import_module("afldm_tpu.ops.upfirdn2d")
import afldm_tpu.shift.metrics as metrics
import afldm_tpu.shift.shifters as shifters
import afldm_tpu.shift.equivariance as equivariance
import afldm_tpu.shift.flow as flow
from afldm_tpu.schedulers import I2SBScheduler

TOL = 1e-5


def to_torch(x_nhwc):
    return torch.from_numpy(
        np.asarray(x_nhwc, np.float32).transpose(0, 3, 1, 2).copy())


def to_nhwc(t_nchw):
    return np.asarray(t_nchw.detach().cpu().numpy()).transpose(0, 2, 3, 1)


def rand_nhwc(rng, n, h, w, c):
    return rng.standard_normal((n, h, w, c)).astype(np.float32)


def assert_close(ours, ref_nhwc, tol=TOL, what=""):
    ours = np.asarray(ours, np.float32)
    ref_nhwc = np.asarray(ref_nhwc, np.float32)
    assert ours.shape == ref_nhwc.shape, (what, ours.shape, ref_nhwc.shape)
    err = np.max(np.abs(ours - ref_nhwc))
    assert err <= tol, f"{what}: max abs err {err} > {tol}"


# ---------------------------------------------------------------------------
# Rect masks (ideal_lpf.py:12-49)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N", [6, 7, 8, 9, 12, 16])
def test_rect_masks(N):
    for cutoff in (0.5, 0.25):
        ref = REF.ideal_lpf.create_lpf_rect(N, cutoff).numpy()
        assert_close(lpf.create_lpf_rect(N, cutoff), ref, 0,
                     f"lpf_rect N={N} c={cutoff}")
        ref = REF.ideal_lpf.create_recon_rect(N, cutoff).numpy()
        assert_close(lpf.create_recon_rect(N, cutoff), ref, 0,
                     f"recon_rect N={N} c={cutoff}")
    for size in (2, 4, N):
        ref = REF.ideal_lpf.create_fixed_lpf_rect(N, size).numpy()
        assert_close(lpf.create_fixed_lpf_rect(N, size), ref, 0,
                     f"fixed_rect N={N} s={size}")


# ---------------------------------------------------------------------------
# LPF / recon LPF / upsample / subpixel shift (ideal_lpf.py:52-172)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N", [8, 12, 16])
@pytest.mark.parametrize("cutoff", [0.5, 0.25])
def test_lpf_rfft_golden(rng, N, cutoff):
    x = rand_nhwc(rng, 2, N, N, 3)
    ref = to_nhwc(REF.ideal_lpf.LPF_RFFT(cutoff=cutoff)(to_torch(x)))
    ours = jax.jit(lambda v: lpf.lpf_rfft(v, cutoff=cutoff))(x)
    assert_close(ours, ref, TOL, f"lpf_rfft N={N}")


@pytest.mark.parametrize("N", [8, 12, 16])
def test_lpf_recon_rfft_golden(rng, N):
    x = rand_nhwc(rng, 2, N, N, 3)
    ref = to_nhwc(REF.ideal_lpf.LPF_RECON_RFFT(cutoff=0.5)(to_torch(x)))
    ours = jax.jit(lambda v: lpf.lpf_recon_rfft(v, cutoff=0.5))(x)
    assert_close(ours, ref, TOL, f"lpf_recon N={N}")


@pytest.mark.parametrize("N", [8, 10, 16])
@pytest.mark.parametrize("up", [2, 4])
@pytest.mark.parametrize("impl", ["ref", "spectral", "matmul"])
def test_upsample_rfft_golden(rng, N, up, impl):
    x = rand_nhwc(rng, 1, N, N, 2)
    ref = to_nhwc(REF.ideal_lpf.UpsampleRFFT(up=up)(to_torch(x)))
    ours = jax.jit(lambda v: lpf.upsample_rfft(v, up=up, impl=impl))(x)
    assert_close(ours, ref, TOL, f"upsample N={N} up={up} impl={impl}")


def test_upsample_rfft_factor_golden(rng):
    x = rand_nhwc(rng, 1, 8, 8, 2)
    ref = to_nhwc(REF.ideal_lpf.UpsampleRFFT(up=4, factor=2)(to_torch(x)))
    ours = jax.jit(lambda v: lpf.upsample_rfft(v, up=4, factor=2,
                                               impl="ref"))(x)
    assert_close(ours, ref, TOL, "upsample factor=2")


@pytest.mark.parametrize("up,sx,sy", [(2, 1, 1), (8, 3, -2)])
def test_subpixel_shift_golden(rng, up, sx, sy):
    x = rand_nhwc(rng, 1, 16, 16, 3)
    ref = to_nhwc(REF.ideal_lpf.subpixel_shift(
        to_torch(x), up=up, shift_x=sx, shift_y=sy))
    ours = jax.jit(lambda v: lpf.subpixel_shift(
        v, up=up, shift_x=sx, shift_y=sy))(x)
    assert_close(ours, ref, TOL, f"subpixel up={up}")


# ---------------------------------------------------------------------------
# The full WarpedNonlinearity sandwich (af_blocks.py:12-28), composed from
# the reference's own LPF modules: up2x -> silu -> LPF(1/2) -> decimate.
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("N", [8, 12, 10])
@pytest.mark.parametrize("impl", ["ref", "spectral", "matmul"])
def test_warped_nonlinearity_sandwich_golden(rng, N, impl):
    x = rand_nhwc(rng, 2, N, N, 4)
    xt = to_torch(x)
    hi = REF.ideal_lpf.UpsampleRFFT(up=2)(xt)
    hi = torch.nn.functional.silu(hi)
    lo = REF.ideal_lpf.LPF_RFFT(cutoff=0.5)(hi)[:, :, ::2, ::2]
    ref = to_nhwc(lo)
    ours = lpf.filtered_nonlinearity(x, act="silu", impl=impl)
    assert_close(ours, ref, TOL, f"warped_nl N={N} impl={impl}")


# ---------------------------------------------------------------------------
# Metrics (shift_utils/metrics.py)
# ---------------------------------------------------------------------------

def test_metrics_golden(rng):
    a = rand_nhwc(rng, 3, 8, 8, 2)
    b = rand_nhwc(rng, 3, 8, 8, 2)
    m = (rng.uniform(size=(3, 8, 8, 2)) > 0.3).astype(np.float32)
    ref_mse = float(REF.metrics.mask_mse(to_torch(a), to_torch(b),
                                         to_torch(m)))
    ref_psnr = float(REF.metrics.mask_psnr(to_torch(a), to_torch(b),
                                           to_torch(m)))
    ref_p = float(REF.metrics.psnr(to_torch(a), to_torch(b)))
    assert abs(float(metrics.mask_mse(a, b, m)) - ref_mse) < 1e-5
    assert abs(float(metrics.mask_psnr(a, b, m)) - ref_psnr) < 1e-4
    assert abs(float(metrics.psnr(a, b)) - ref_p) < 1e-4


# ---------------------------------------------------------------------------
# Shifters: masks + all six filter modes (shift_utils/shifters.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ti,tj", [(2.0, -3.0), (0.5, -1.25), (-7.0, 0.0),
                                   (0.0, 0.0)])
def test_gen_valid_mask_golden(ti, tj):
    ref = REF.shifters.gen_valid_mask((2, 3, 8, 10), ti, tj).numpy()
    ours = np.asarray(shifters.gen_valid_mask((2, 8, 10, 3), ti, tj))
    assert_close(ours, ref.transpose(0, 2, 3, 1), 0, "gen_valid_mask")


@pytest.mark.parametrize("mode", shifters.FILTER_CHOICES)
@pytest.mark.parametrize("ti,tj", [(2.0, -3.0), (0.5, -1.25)])
def test_shifter_modes_golden(rng, mode, ti, tj):
    x = rand_nhwc(rng, 2, 16, 16, 3)
    kwargs = {}
    if mode in ("ideal", "ideal_crop"):
        kwargs["upsample_ratio"] = 8
    ref_sh = REF.shifters.ImageShifter(mode, **kwargs)
    ref_w, ref_m = ref_sh.shift(to_torch(x), ti, tj)
    ours_sh = shifters.ImageShifter(mode, **kwargs)
    our_w, our_m = ours_sh.shift(x, ti, tj)
    assert_close(our_w, to_nhwc(ref_w), 2e-5, f"shift[{mode}] warped")
    ref_m = ref_m.to(torch.float32)
    if ref_m.shape[1] == 1:
        ref_m_nhwc = to_nhwc(ref_m)
        our_m = np.asarray(our_m, np.float32).reshape(ref_m_nhwc.shape)
        assert_close(our_m, ref_m_nhwc, 0, f"shift[{mode}] mask")
    else:
        assert_close(our_m, to_nhwc(ref_m), 0, f"shift[{mode}] mask")


def test_fourier_shift_batch_golden(rng):
    # square only: the reference's phase grid is built [W, H]-transposed
    # (shifters.py:118-124) and only broadcasts when H == W; afldm_tpu
    # additionally supports non-square (tested in test_shift.py).
    x = rand_nhwc(rng, 2, 16, 16, 3)
    ref = to_nhwc(REF.shifters.fourier_shift_batch(
        to_torch(x), 1.5, -2.25, torch.device("cpu")))
    ours = jax.jit(lambda v: shifters.fourier_shift_batch(v, 1.5, -2.25))(x)
    assert_close(ours, ref, TOL, "fourier_shift_batch")


# ---------------------------------------------------------------------------
# upfirdn2d and wrappers vs the reference's pure-torch impl='ref' path
# (torch_utils/ops/upfirdn2d.py:118-273; CPU automatically selects ref)
# ---------------------------------------------------------------------------

UPFIRDN_CASES = [
    dict(up=1, down=1, padding=(1, 2, 3, 4), flip_filter=False, gain=1),
    dict(up=2, down=1, padding=2, flip_filter=False, gain=1),
    dict(up=1, down=2, padding=1, flip_filter=True, gain=1),
    dict(up=2, down=2, padding=(2, 1, 1, 2), flip_filter=False, gain=2),
    dict(up=(2, 1), down=(1, 2), padding=(1, 1, 2, 2), flip_filter=False,
         gain=1),
]


@pytest.mark.parametrize("case", UPFIRDN_CASES)
@pytest.mark.parametrize("fshape", [(3, 5), (4,)])
def test_upfirdn2d_golden(rng, case, fshape):
    x = rand_nhwc(rng, 2, 10, 12, 3)
    f = rng.standard_normal(fshape).astype(np.float32)
    ref = to_nhwc(REF.upfirdn2d.upfirdn2d(
        to_torch(x), torch.from_numpy(f), **case))
    ours = uf.upfirdn2d(x, jnp.asarray(f), **case)
    assert_close(ours, ref, TOL, f"upfirdn2d {case} f={fshape}")


def test_upfirdn_wrappers_golden(rng):
    x = rand_nhwc(rng, 1, 8, 10, 2)
    f = rng.standard_normal((4, 4)).astype(np.float32)
    ft = torch.from_numpy(f)
    fj = jnp.asarray(f)
    assert_close(uf.filter2d(x, fj), to_nhwc(
        REF.upfirdn2d.filter2d(to_torch(x), ft)), TOL, "filter2d")
    assert_close(uf.upsample2d(x, fj, up=2), to_nhwc(
        REF.upfirdn2d.upsample2d(to_torch(x), ft, up=2)), TOL, "upsample2d")
    assert_close(uf.downsample2d(x, fj, down=2), to_nhwc(
        REF.upfirdn2d.downsample2d(to_torch(x), ft, down=2)), TOL,
        "downsample2d")


def test_bias_act_golden(rng):
    """All nine activations vs the reference bias_act ref path (CPU picks
    impl='ref' automatically), incl. default gains, alpha, clamp."""
    from afldm.af_libs.torch_utils.ops import bias_act as ref_ba
    ba = importlib.import_module("afldm_tpu.ops.bias_act")

    x = rand_nhwc(rng, 2, 6, 6, 5)
    b = rng.standard_normal((5,)).astype(np.float32)
    for act in ba.activation_funcs:
        ref = to_nhwc(ref_ba.bias_act(to_torch(x), torch.from_numpy(b),
                                      dim=1, act=act))
        ours = ba.bias_act(x, jnp.asarray(b), act=act)
        assert_close(ours, ref, 2e-6, f"bias_act[{act}]")
    # explicit alpha/gain/clamp
    ref = to_nhwc(ref_ba.bias_act(to_torch(x), torch.from_numpy(b), dim=1,
                                  act="lrelu", alpha=0.1, gain=3.0,
                                  clamp=0.5))
    ours = ba.bias_act(x, jnp.asarray(b), act="lrelu", alpha=0.1, gain=3.0,
                       clamp=0.5)
    assert_close(ours, ref, 2e-6, "bias_act lrelu/gain/clamp")


@pytest.mark.parametrize("up,down,padding,flip_weight", [
    (1, 1, 1, True), (2, 1, 0, True), (1, 2, 1, False), (2, 2, 2, True)])
def test_conv2d_resample_golden(rng, up, down, padding, flip_weight):
    from afldm.af_libs.torch_utils.ops import conv2d_resample as ref_cr

    x = rand_nhwc(rng, 1, 8, 8, 3)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)  # OIHW
    f = REF.upfirdn2d.setup_filter([1, 3, 3, 1])
    ref = to_nhwc(ref_cr.conv2d_resample(
        to_torch(x), torch.from_numpy(w), f=f if (up > 1 or down > 1)
        else None, up=up, down=down, padding=padding,
        flip_weight=flip_weight))
    wj = jnp.asarray(w.transpose(2, 3, 1, 0))  # OIHW -> HWIO
    fj = jnp.asarray(f.numpy()) if (up > 1 or down > 1) else None
    ours = uf.conv2d_resample(jnp.asarray(x), wj, f=fj, up=up, down=down,
                               padding=padding, flip_weight=flip_weight)
    assert_close(ours, ref, 2e-5,
                 f"conv2d_resample up={up} down={down} pad={padding}")


@pytest.mark.parametrize("up,down,padding", [(2, 2, 2), (2, 1, (1, 2, 3, 4)),
                                             (1, 2, 1)])
def test_filtered_lrelu_golden(rng, up, down, padding):
    """The FIR-path mega-kernel composition vs the reference's
    _filtered_lrelu_ref (filtered_lrelu.py:121-157)."""
    from afldm.af_libs.torch_utils.ops import filtered_lrelu as ref_fl
    from afldm_tpu.ops.bias_act import filtered_lrelu

    x = rand_nhwc(rng, 1, 8, 10, 3)
    b = rng.standard_normal((3,)).astype(np.float32)
    fu = REF.upfirdn2d.setup_filter([1, 3, 3, 1])
    fd = REF.upfirdn2d.setup_filter([1, 2, 2, 1])
    ref = to_nhwc(ref_fl.filtered_lrelu(
        to_torch(x), fu=fu, fd=fd, b=torch.from_numpy(b), up=up, down=down,
        padding=padding, clamp=1.5, impl="ref"))
    ours = filtered_lrelu(jnp.asarray(x), fu=jnp.asarray(fu.numpy()),
                          fd=jnp.asarray(fd.numpy()), b=jnp.asarray(b),
                          up=up, down=down, padding=padding, clamp=1.5)
    assert_close(ours, ref, 2e-5,
                 f"filtered_lrelu up={up} down={down} pad={padding}")


def test_setup_filter_golden():
    for fin in ([1, 3, 3, 1], [[1, 2], [3, 4]], None):
        ref = REF.upfirdn2d.setup_filter(fin, gain=2).numpy()
        ours = np.asarray(uf.setup_filter(fin, gain=2))
        assert_close(ours, ref, 1e-6, f"setup_filter {fin}")


# ---------------------------------------------------------------------------
# StyleGAN-3 equivariance translation ops (af_libs/equivariance.py)
# ---------------------------------------------------------------------------

def test_integer_translation_golden(rng):
    x = rand_nhwc(rng, 2, 12, 16, 3)
    ref_y, ref_m = REF.equivariance.apply_integer_translation(
        to_torch(x), 0.21, -0.33)
    our_y, our_m = equivariance.apply_integer_translation(x, 0.21, -0.33)
    assert_close(our_y, to_nhwc(ref_y), TOL, "int translation")
    assert_close(our_m, to_nhwc(ref_m), TOL, "int translation mask")


def test_fractional_translation_golden(rng):
    x = rand_nhwc(rng, 2, 12, 16, 3)
    ref_y, ref_m = REF.equivariance.apply_fractional_translation(
        to_torch(x), 0.137, -0.291)
    our_y, our_m = equivariance.apply_fractional_translation(x, 0.137, -0.291)
    assert_close(our_y, to_nhwc(ref_y), 2e-5, "frac translation")
    assert_close(our_m, to_nhwc(ref_m), 2e-5, "frac translation mask")


def test_affine_bandlimit_filter_golden():
    angle = 0.3
    mat = np.array([[np.cos(angle), -np.sin(angle)],
                    [np.sin(angle), np.cos(angle)]], np.float32)
    ref = REF.equivariance.construct_affine_bandlimit_filter(
        torch.from_numpy(mat)).numpy()
    ours = np.asarray(equivariance.construct_affine_bandlimit_filter(mat))
    assert_close(ours, ref, 1e-4, "affine bandlimit filter")


def test_fractional_rotation_golden(rng):
    x = rand_nhwc(rng, 1, 16, 16, 2)
    ref_y, ref_m = REF.equivariance.apply_fractional_rotation(
        to_torch(x), 0.2)
    our_y, our_m = equivariance.apply_fractional_rotation(x, 0.2)
    assert_close(our_y, to_nhwc(ref_y), 1e-4, "frac rotation")
    assert_close(our_m, to_nhwc(ref_m), 1e-4, "frac rotation mask")


# ---------------------------------------------------------------------------
# Flow warps: torch path + the numba splats (run as plain python via shim)
# ---------------------------------------------------------------------------

def _rand_flow(rng, n, h, w, scale=2.5):
    return (rng.uniform(size=(n, h, w, 2)).astype(np.float32) * 2 - 1) * scale


def test_flow_warp_golden(rng):
    x = rand_nhwc(rng, 2, 10, 14, 3)
    fl = _rand_flow(rng, 2, 10, 14)
    # reference flow layout is (N, 2, H, W) ordered (di, dj)
    fl_t = torch.from_numpy(fl.transpose(0, 3, 1, 2).copy())
    ref_y, ref_m = REF.flow_utils.flow_warp(to_torch(x), fl_t, mask=True)
    our_y, our_m = flow.flow_warp(x, fl, mask=True)
    assert_close(our_y, to_nhwc(ref_y), 2e-5, "flow_warp")
    assert_close(np.asarray(our_m, np.float32),
                 ref_m.to(torch.float32).numpy(), 0, "flow_warp mask")


def test_forward_flow_warp_golden(rng):
    x = rand_nhwc(rng, 1, 8, 8, 2)
    fl = _rand_flow(rng, 1, 8, 8, scale=2.0)
    fl_t = torch.from_numpy(fl.transpose(0, 3, 1, 2).copy())
    ref_y, ref_occ = REF.flow_utils_np.forward_flow_warp(to_torch(x), fl_t)
    our_y, our_occ = flow.forward_flow_warp(x, fl)
    assert_close(our_y, to_nhwc(ref_y), 1e-5, "forward_flow_warp")
    assert_close(our_occ, to_nhwc(ref_occ), 0, "forward_flow_warp occ")


def test_splat_nearest_golden(rng):
    x = rand_nhwc(rng, 1, 8, 8, 2)
    fl = np.round(_rand_flow(rng, 1, 8, 8, scale=2.0))
    occ = (rng.uniform(size=(1, 8, 8, 1)) > 0.7).astype(np.float32)
    fl_t = torch.from_numpy(fl.transpose(0, 3, 1, 2).copy())
    occ_t = torch.from_numpy(occ.transpose(0, 3, 1, 2).copy())
    ref = REF.flow_utils_np.flow_warp2(to_torch(x), fl_t, occ_t)
    ours = flow.flow_warp_splat_nearest(x, fl, occ)
    assert_close(ours, to_nhwc(ref), 1e-5, "flow_warp2 splat")


def test_intermediate_warp_mask_golden(rng):
    fl = _rand_flow(rng, 1, 8, 8, scale=2.0)
    occ = (rng.uniform(size=(1, 8, 8, 1)) > 0.8).astype(np.float32)
    fl_t = torch.from_numpy(fl.transpose(0, 3, 1, 2).copy())
    occ_t = torch.from_numpy(occ.transpose(0, 3, 1, 2).copy())
    ref_bf, ref_occ = REF.flow_utils_np.get_intermediate_warp_mask(
        fl_t, occ_t, 0.5)
    our_bf, our_occ = flow.get_intermediate_warp_mask(fl, occ, 0.5)
    ref_occ = to_nhwc(ref_occ)
    assert_close(our_occ, ref_occ, 0, "warp mask occ")
    # bwd flow is order-defined where count > 1; those cells are masked
    # occluded by both implementations — compare the visible cells only.
    vis = 1.0 - ref_occ
    assert_close(np.asarray(our_bf) * vis, to_nhwc(ref_bf) * vis, 1e-6,
                 "warp mask bwd flow (visible)")


def test_forward_backward_consistency_golden(rng):
    fwd = _rand_flow(rng, 1, 10, 12, scale=1.5)
    bwd = -fwd + _rand_flow(rng, 1, 10, 12, scale=0.3)
    to_t2 = lambda f: torch.from_numpy(  # noqa: E731
        f.transpose(0, 3, 1, 2).copy())
    ref_fo, ref_bo = REF.flow_utils.forward_backward_consistency_check(
        to_t2(fwd), to_t2(bwd))
    our_fo, our_bo = flow.forward_backward_consistency_check(fwd, bwd)
    assert_close(np.asarray(our_fo)[..., 0], ref_fo[:, 0].numpy() if
                 ref_fo.ndim == 4 else ref_fo.numpy(), 0, "fwd occ")
    assert_close(np.asarray(our_bo)[..., 0], ref_bo[:, 0].numpy() if
                 ref_bo.ndim == 4 else ref_bo.numpy(), 0, "bwd occ")


def test_flow_reverse_map_golden(rng):
    """The reference's flow_revserse_map (uncalled anywhere upstream)
    applies the flow with swapped axes relative to every other flow util:
    after its flip(1), channel 0 (=dj) is added to the ROW index
    (flow_utils.py:117-125). afldm_tpu keeps the consistent (di, dj)
    convention, so parity holds against the reference fed the swapped
    layout."""
    x = rand_nhwc(rng, 1, 8, 10, 3)
    fl = np.round(_rand_flow(rng, 1, 8, 10, scale=2.0))
    fl_swapped = torch.from_numpy(
        fl[..., ::-1].transpose(0, 3, 1, 2).copy())
    ref = to_nhwc(REF.flow_utils.flow_revserse_map(to_torch(x), fl_swapped))
    ours = flow.flow_reverse_map(x, fl)
    assert_close(ours, ref, 1e-6, "flow_reverse_map")


def test_get_patch_moving_flow_golden():
    ref_f, ref_o = REF.flow_utils.get_patch_moving_flow(
        torch.zeros(1, 3, 16, 16), (2, 6, 3, 9), (2.0, -1.0), alpha=0.7)
    our_f, our_o = flow.get_patch_moving_flow(
        np.zeros((1, 16, 16, 3), np.float32), (2, 6, 3, 9), (2.0, -1.0),
        alpha=0.7)
    assert_close(our_f, to_nhwc(ref_f), 1e-6, "patch flow")
    assert_close(our_o, to_nhwc(ref_o), 0, "patch occ")


def test_forward_upsample_flow_warp_golden(rng):
    x = rand_nhwc(rng, 1, 8, 8, 2)
    fl = _rand_flow(rng, 1, 16, 16, scale=3.0)
    fl_t = torch.from_numpy(fl.transpose(0, 3, 1, 2).copy())
    ref_y, ref_o = REF.flow_utils.forward_upsample_flow_warp(
        to_torch(x), fl_t, scale=2)
    our_y, our_o = flow.forward_upsample_flow_warp(x, fl, scale=2)
    assert_close(our_y, to_nhwc(ref_y), 1e-5, "fwd upsample warp")
    assert_close(our_o, to_nhwc(ref_o), 0, "fwd upsample warp occ")


def test_input_padder_golden(rng):
    x = rand_nhwc(rng, 1, 10, 13, 3)
    ref_p = REF.flow_utils.InputPadder((1, 3, 10, 13), padding_factor=8)
    ref_out = ref_p.pad(to_torch(x))[0]
    our_p = flow.InputPadder((1, 10, 13, 3), padding_factor=8)
    our_out = our_p.pad(x)[0]
    assert_close(our_out, to_nhwc(ref_out), 0, "InputPadder.pad")
    assert_close(our_p.unpad(our_out), to_nhwc(ref_p.unpad(ref_out)), 0,
                 "InputPadder.unpad")


# ---------------------------------------------------------------------------
# I2SB scheduler: tables, timestep spacing, bridge ops, full ODE trajectory
# (schedulers/i2sb_scheduler.py:142-531)
# ---------------------------------------------------------------------------

I2SB_CONFIGS = [
    dict(num_train_timesteps=1000, beta_start=1e-4, beta_end=0.02,
         beta_schedule="linear"),
    dict(num_train_timesteps=1000, beta_start=0.0015, beta_end=0.0195,
         beta_schedule="scaled_linear", clip_sample=False),
]


@pytest.mark.parametrize("cfg", I2SB_CONFIGS)
def test_i2sb_tables_golden(cfg):
    ref = REF.i2sb_scheduler.I2SBScheduler(**cfg)
    ours = I2SBScheduler(**cfg)
    for name in ("betas", "std_fwd", "std_bwd", "std_sb", "mu_x0", "mu_x1"):
        r = getattr(ref, name).numpy()
        o = np.asarray(getattr(ours, name), np.float32)
        assert_close(o, r, 1e-5, f"i2sb.{name}")


@pytest.mark.parametrize("spacing", ["linspace", "leading", "trailing"])
def test_i2sb_set_timesteps_golden(spacing):
    ref = REF.i2sb_scheduler.I2SBScheduler(timestep_spacing=spacing)
    ref.set_timesteps(50)
    ours = I2SBScheduler(timestep_spacing=spacing)
    ours.set_timesteps(50)
    assert np.array_equal(np.asarray(ours.timesteps),
                          ref.timesteps.numpy()), spacing


def test_i2sb_custom_timesteps_golden():
    ts = [900, 600, 300, 100, 0]
    ref = REF.i2sb_scheduler.I2SBScheduler()
    ref.set_timesteps(timesteps=ts)
    ours = I2SBScheduler()
    ours.set_timesteps(timesteps=ts)
    assert np.array_equal(np.asarray(ours.timesteps), ref.timesteps.numpy())


def test_i2sb_add_noise_label_golden(rng):
    x0 = rand_nhwc(rng, 2, 4, 4, 3)
    x1 = rand_nhwc(rng, 2, 4, 4, 3)
    t = np.array([100, 700])
    ref = REF.i2sb_scheduler.I2SBScheduler()
    ours = I2SBScheduler()
    ref_xt = ref.add_noise(to_torch(x0), to_torch(x1),
                           torch.from_numpy(t), is_ode=True)
    our_xt = ours.add_noise(x0, x1, t, is_ode=True)
    assert_close(our_xt, to_nhwc(ref_xt), 1e-5, "i2sb add_noise ode")
    ref_lbl = ref.compute_label(torch.from_numpy(t), to_torch(x0), ref_xt)
    our_lbl = ours.compute_label(t, x0, our_xt)
    assert_close(our_lbl, to_nhwc(ref_lbl), 1e-5, "i2sb compute_label")


@pytest.mark.parametrize("cfg", I2SB_CONFIGS)
def test_i2sb_ode_trajectory_golden(rng, cfg):
    """Deterministic (ODE) denoise with a fixed fake model: the same
    trajectory must fall out of both schedulers. The final step is skipped
    exactly as the reference pipeline does (i2sb_pipeline.py:47-49 — its
    previous_timestep would go negative there)."""
    ref = REF.i2sb_scheduler.I2SBScheduler(**cfg)
    ours = I2SBScheduler(**cfg)
    ref.set_timesteps(8)
    ours.set_timesteps(8)

    x = rand_nhwc(rng, 1, 4, 4, 2)
    w = rng.standard_normal((2,)).astype(np.float32) * 0.1

    xt_ref = to_torch(x)
    xt_our = jnp.asarray(x)
    ts = np.asarray(ours.timesteps)
    for i, t in enumerate(ts[:-1]):
        eps_ref = xt_ref * torch.from_numpy(w).reshape(1, 2, 1, 1)
        out = ref.step(eps_ref, int(t), xt_ref, is_ode=True)
        xt_ref = out.prev_sample

        eps_our = xt_our * jnp.asarray(w).reshape(1, 1, 1, 2)
        xt_our, _ = ours.step(eps_our, int(t), int(ts[i + 1]), xt_our,
                              is_ode=True)
    assert_close(xt_our, to_nhwc(xt_ref), 2e-5, "i2sb ODE trajectory")


# ---------------------------------------------------------------------------
# Non-YOSO ControlNet branch (VERDICT r3 item 6): guess-mode scaling and
# multi-step residual-injection wiring pinned to the torch semantics of
# /root/reference/afldm/pipelines/normal_control_pipeline.py:340-396 and
# /root/reference/afldm/models/my_controlnet.py:212-231. The reference
# classes subclass diffusers (not importable here), so the loop is
# transcribed in torch inside the test, with the SAME tiny jax models on
# both sides — what is being pinned is the control flow: per-step residual
# recompute, guess-mode conditional-only ControlNet + zero-padded uncond
# residuals, CFG combine, DDIM chaining.
#
# Honesty note on CFG: the reference's copy of the diffusers loop dropped
# the `torch.cat([latents] * 2)` batch expansion (its line 341 comment
# survives but not the cat), so its non-YOSO CFG branch would shape-error
# in torch. The torch loop below restores the diffusers original semantics
# (StableDiffusionControlNetPipeline.__call__), which is what
# pipelines/normal_control.py implements.
# ---------------------------------------------------------------------------

def _tiny_sd_models():
    from afldm_tpu.models import (UNet2DConditionModel, UNet2DConditionConfig,
                                  ControlNetModel, ControlNetConfig)
    ucfg = UNet2DConditionConfig(
        sample_size=8, block_out_channels=(16, 32),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
        norm_num_groups=8, alias_free=False)
    unet = UNet2DConditionModel(ucfg)
    cn = ControlNetModel(ControlNetConfig.from_unet_config(ucfg))
    lat = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, 77, 16))
    t0 = jnp.zeros((1,), jnp.int32)
    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    up = jax.jit(unet.init)(k1, lat, t0, ehs)
    cp = jax.jit(cn.init)(k2, lat, t0, ehs, lat)
    return unet, up, cn, cp


def test_controlnet_guess_mode_scaling_golden():
    """Guess mode must scale down-residual i by torch.logspace(-1, 0,
    n+1)[i] * conditioning_scale and the mid residual by the last ramp
    entry (ref models/my_controlnet.py:212-231)."""
    unet, up, cn, cp = _tiny_sd_models()
    rng_ = np.random.default_rng(3)
    lat = jnp.asarray(rng_.standard_normal((2, 8, 8, 4)), jnp.float32)
    cond = jnp.asarray(rng_.standard_normal((2, 8, 8, 4)), jnp.float32)
    ehs = jnp.asarray(rng_.standard_normal((2, 77, 16)), jnp.float32)
    t = jnp.full((2,), 7, jnp.int32)

    cs = 0.75
    apply = jax.jit(cn.apply, static_argnames=("guess_mode",))
    d_plain, m_plain, _ = apply(cp, lat, t, ehs, cond,
                                conditioning_scale=1.0, guess_mode=False)
    d_guess, m_guess, _ = apply(cp, lat, t, ehs, cond,
                                conditioning_scale=cs, guess_mode=True)

    ramp = torch.logspace(-1, 0, len(d_plain) + 1)  # the reference's ramp
    for i, (dp, dg) in enumerate(zip(d_plain, d_guess)):
        assert_close(dg, np.asarray(dp) * float(ramp[i]) * cs,
                     tol=1e-5, what=f"guess down[{i}]")
    assert_close(m_guess, np.asarray(m_plain) * float(ramp[-1]) * cs,
                 tol=1e-5, what="guess mid")
    # non-guess: flat conditioning_scale on every residual
    d_cs, m_cs, _ = apply(cp, lat, t, ehs, cond,
                          conditioning_scale=cs, guess_mode=False)
    for i, (dp, dc) in enumerate(zip(d_plain, d_cs)):
        assert_close(dc, np.asarray(dp) * cs, tol=1e-5,
                     what=f"cond_scale down[{i}]")
    assert_close(m_cs, np.asarray(m_plain) * cs, tol=1e-5,
                 what="cond_scale mid")


@pytest.mark.parametrize("gs,guess", [(1.0, False), (3.0, False),
                                      (3.0, True)])
def test_non_yoso_multistep_injection_golden(gs, guess):
    """pipelines/normal_control.py:_denoise_fn (jitted scan) vs a torch
    transcription of the reference/diffusers denoise loop with identical
    models/tables: per-step ControlNet residual recompute + injection,
    guess-mode conditional-only ControlNet with zero-padded uncond
    residuals, eps-CFG combine, DDIM step chaining."""
    from afldm_tpu.pipelines.normal_control import NormControlPipeline
    from afldm_tpu.schedulers import DDIMScheduler

    unet, up, cn, cp = _tiny_sd_models()
    # clip_sample=False as in every SD-family scheduler config (the torch
    # transcription below implements the unclipped eta=0 update)
    sched = DDIMScheduler(num_train_timesteps=100, clip_sample=False)
    pipe = NormControlPipeline(None, None, unet, up, cn, cp, sched,
                               scaling_factor=1.0)

    rng_ = np.random.default_rng(9)
    lats = jnp.asarray(rng_.standard_normal((2, 8, 8, 4)), jnp.float32)
    cond = jnp.asarray(rng_.standard_normal((2, 8, 8, 4)), jnp.float32)
    ehs_c = jnp.asarray(rng_.standard_normal((2, 77, 16)), jnp.float32)
    ehs_u = jnp.asarray(rng_.standard_normal((2, 77, 16)), jnp.float32)

    num_steps = 4
    do_cfg = gs > 1.0
    ts = jnp.asarray(sched.set_timesteps(num_steps))
    ts_prev = ts - sched.num_train_timesteps // num_steps

    run = pipe._denoise_fn(num_steps, do_cfg, guess)
    ours = run(up, cp, lats, cond, ehs_u, ehs_c, ts, ts_prev,
               jnp.asarray(gs, jnp.float32))

    # ---- torch transcription of the reference loop ----
    def cn_t(x, t, e, c, guess_mode):
        d, m, _ = jax.jit(cn.apply, static_argnames=("guess_mode",))(
            cp, jnp.asarray(x.numpy()), jnp.full((x.shape[0],), t,
                                                 jnp.int32),
            jnp.asarray(e.numpy()), jnp.asarray(c.numpy()),
            guess_mode=guess_mode)
        return ([torch.from_numpy(np.asarray(r)) for r in d],
                torch.from_numpy(np.asarray(m)))

    def unet_t(x, t, e, d, m):
        eps, _ = jax.jit(unet.apply)(
            up, jnp.asarray(x.numpy()),
            jnp.full((x.shape[0],), t, jnp.int32), jnp.asarray(e.numpy()),
            down_block_residuals=tuple(jnp.asarray(r.numpy()) for r in d),
            mid_block_residual=jnp.asarray(m.numpy()))
        return torch.from_numpy(np.asarray(eps))

    # DDIM tables are pinned separately (test_ddim_step_matches_formula);
    # the step FORMULA below is the diffusers eta=0 update in torch
    acp = torch.from_numpy(np.asarray(sched.alphas_cumprod,
                                      np.float32))
    final_alpha = torch.tensor(float(sched.final_alpha_cumprod))

    def ddim_step(eps, t, pt, x):
        a_t = acp[t]
        a_prev = acp[pt] if pt >= 0 else final_alpha
        x0 = (x - (1 - a_t).sqrt() * eps) / a_t.sqrt()
        return a_prev.sqrt() * x0 + (1 - a_prev).sqrt() * eps

    x = torch.from_numpy(np.asarray(lats))
    c = torch.from_numpy(np.asarray(cond))
    pe_c = torch.from_numpy(np.asarray(ehs_c))
    pe_u = torch.from_numpy(np.asarray(ehs_u))
    prompt_embeds = torch.cat([pe_u, pe_c]) if do_cfg else pe_c

    for t, pt in zip(np.asarray(ts), np.asarray(ts_prev)):
        lmi = torch.cat([x] * 2) if do_cfg else x
        # scale_model_input is identity for DDIM
        if guess and do_cfg:
            # ref :352-356: ControlNet sees only the conditional batch
            d, m = cn_t(x, int(t), prompt_embeds.chunk(2)[1], c, True)
            d = [torch.cat([torch.zeros_like(r), r]) for r in d]
            m = torch.cat([torch.zeros_like(m), m])
        else:
            cmi_cond = torch.cat([c] * 2) if do_cfg else c
            d, m = cn_t(lmi, int(t), prompt_embeds, cmi_cond, guess)
        noise_pred = unet_t(lmi, int(t), prompt_embeds, d, m)
        if do_cfg:
            eu, ec = noise_pred.chunk(2)
            noise_pred = eu + gs * (ec - eu)
        x = ddim_step(noise_pred, int(t), int(pt), x)

    assert_close(ours, x.numpy(), tol=5e-4,
                 what=f"non-yoso gs={gs} guess={guess}")
