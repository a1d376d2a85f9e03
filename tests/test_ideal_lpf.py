"""Property tests for the ideal-LPF core (SURVEY.md §4 test plan):
- masks match the reference construction rules bit-exactly,
- spectral fast paths equal the literal zero-stuff/mask/decimate algorithm,
- ideal LPF removes out-of-band energy exactly,
- upsample∘decimate = identity on bandlimited input,
- subpixel_shift equals a Fourier phase shift on bandlimited signals.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from afldm_tpu.ops import (
    create_lpf_rect,
    create_recon_rect,
    lpf_rfft,
    lpf_recon_rfft,
    upsample_rfft,
    downsample_rfft,
    subpixel_shift,
    filtered_nonlinearity,
)


def _rand(rng, n=2, h=16, w=16, c=3):
    return jnp.asarray(rng.standard_normal((n, h, w, c)), dtype=jnp.float32)


# --- mask construction -----------------------------------------------------

@pytest.mark.parametrize("N", [4, 8, 16, 32, 6, 10, 5, 7])
def test_lpf_rect_rules(N):
    m = create_lpf_rect(N, 0.5)
    r = m[:, 0] / m[0, 0]
    cutoff_low = int((N * 0.5) // 2)
    assert r[0] == 1.0
    assert np.all(r[cutoff_low + 1: N - cutoff_low] == 0.0)
    if N % 4 == 0:
        assert r[cutoff_low] == 0.0 and r[N - cutoff_low] == 0.0
    elif cutoff_low >= 1:
        assert r[cutoff_low] == 1.0


@pytest.mark.parametrize("N", [4, 8, 16, 6, 10])
def test_recon_rect_rules(N):
    m = create_recon_rect(N, 0.5)
    r = m[:, 0] / m[0, 0]
    cutoff_low = int((N * 0.5) // 2)
    if N % 4 == 0:
        assert r[cutoff_low] == 0.5 and r[N - cutoff_low] == 0.5


# --- literal vs reference algorithm ----------------------------------------

def _lpf_literal(x, cutoff):
    """Mask-multiply in full-FFT domain, the reference algorithm verbatim."""
    H, W = x.shape[1], x.shape[2]
    assert H == W
    mask = create_lpf_rect(H, cutoff)
    X = np.fft.fft2(np.asarray(x), axes=(1, 2))
    out = np.real(np.fft.ifft2(X * mask[None, :, :, None], axes=(1, 2)))
    return out


@pytest.mark.parametrize("hw", [(16, 16), (8, 8), (32, 16)])
def test_lpf_rfft_matches_full_fft(rng, hw):
    h, w = hw
    x = _rand(rng, h=h, w=w)
    got = lpf_rfft(x, 0.5)
    if h == w:
        want = _lpf_literal(x, 0.5)
        np.testing.assert_allclose(got, want, atol=1e-5)
    # idempotent: filtering twice == once
    np.testing.assert_allclose(lpf_rfft(got, 0.5), got, atol=1e-5)


def test_lpf_removes_out_of_band(rng):
    # a pure high-frequency signal must vanish
    h = w = 16
    fy = np.zeros((h, w), np.float32)
    Y = np.zeros((h, w), np.complex64)
    Y[7, 7] = 1.0  # above cutoff 4
    fy = np.real(np.fft.ifft2(Y)).astype(np.float32)
    x = jnp.tile(fy[None, :, :, None], (1, 1, 1, 1))
    out = lpf_rfft(x, 0.5)
    assert np.abs(np.asarray(out)).max() < 1e-6


# --- spectral fast paths vs literal ----------------------------------------

@pytest.mark.parametrize("up", [2, 4, 8])
@pytest.mark.parametrize("hw", [(8, 8), (16, 8), (6, 10)])
def test_upsample_spectral_equals_ref(rng, up, hw):
    h, w = hw
    x = _rand(rng, h=h, w=w)
    fast = upsample_rfft(x, up=up, impl="spectral")
    ref = upsample_rfft(x, up=up, impl="ref")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("hw", [(8, 8), (16, 8), (12, 20)])
def test_downsample_spectral_equals_ref(rng, hw):
    h, w = hw
    x = _rand(rng, h=h, w=w)
    fast = downsample_rfft(x, down=2, impl="spectral")
    ref = lpf_rfft(x, cutoff=0.5)[:, ::2, ::2, :]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_up_down_roundtrip_identity(rng):
    """downsample(upsample(x)) == x minus its Nyquist band (the N%4 band-edge
    rule zeroes bin N/2 on the way down; everything below passes exactly)."""
    x = _rand(rng, h=16, w=16)
    y = downsample_rfft(upsample_rfft(x, up=2), down=2)

    X = np.fft.fft2(np.asarray(x), axes=(1, 2))
    X[:, 8, :, :] = 0.0
    X[:, :, 8, :] = 0.0
    want = np.real(np.fft.ifft2(X, axes=(1, 2)))
    np.testing.assert_allclose(np.asarray(y), want, atol=2e-5)

    # and exact identity on Nyquist-free input
    xb = jnp.asarray(want, jnp.float32)
    y2 = downsample_rfft(upsample_rfft(xb, up=2), down=2)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(xb), atol=2e-5)


def test_upsample_preserves_samples_modulo_filter(rng):
    """On an already-bandlimited input, upsampling then decimating at the
    original grid returns the LPF'd input exactly."""
    x = lpf_rfft(_rand(rng, h=16, w=16), 0.5)
    up = upsample_rfft(x, up=2)
    np.testing.assert_allclose(np.asarray(up[:, ::2, ::2, :]),
                               np.asarray(lpf_recon_rfft(x, 0.5)), atol=2e-5)


# --- subpixel shift ---------------------------------------------------------

def test_subpixel_shift_integer_equals_roll(rng):
    x = _rand(rng, h=16, w=16)
    # full-pixel shift (shift_x = up) on a bandlimited signal == roll
    xb = lpf_rfft(x, 0.5)
    got = subpixel_shift(xb, up=2, shift_x=2, shift_y=0)
    want = jnp.roll(lpf_recon_rfft(xb, 0.5), -1, axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_subpixel_shift_matches_phase_shift(rng):
    """Fractional shift of a (strictly) bandlimited signal == Fourier phase
    shift. Use a signal with zero Nyquist band so both definitions agree."""
    h = w = 16
    x = _rand(rng, h=h, w=w)
    x = lpf_rfft(x, 0.5)  # kills everything at/above quarter band edge
    up = 2
    got = np.asarray(subpixel_shift(x, up=up, shift_x=1, shift_y=0))[0, :, :, 0]

    X = np.fft.fft2(np.asarray(x)[0, :, :, 0])
    fy = np.fft.fftfreq(h)[:, None]
    # roll(-1) at the 2x grid then decimate samples x[n + 0.5]:
    # phase factor e^{+2pi i f d} with d = +0.5
    Xs = X * np.exp(2j * np.pi * fy * 0.5)
    want = np.real(np.fft.ifft2(Xs))
    np.testing.assert_allclose(got, want, atol=1e-4)


# --- filtered nonlinearity ---------------------------------------------------

def test_filtered_nonlinearity_matches_ref_impl(rng):
    x = _rand(rng, h=16, w=16)
    fast = filtered_nonlinearity(x, "silu", impl="spectral")
    ref = filtered_nonlinearity(x, "silu", impl="ref")
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_filtered_nonlinearity_low_ndim_passthrough(rng):
    v = jnp.asarray(rng.standard_normal((4, 8)), dtype=jnp.float32)
    out = filtered_nonlinearity(v, "silu")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.asarray(v) * (1 / (1 + np.exp(-np.asarray(v))))),
                               atol=1e-5)


def test_filtered_nonlinearity_shift_equivariance(rng):
    """The whole point: wrapped SiLU commutes with integer rolls and is far
    more equivariant to half-pixel shifts than plain SiLU."""
    import jax
    x = lpf_rfft(_rand(rng, n=1, h=32, w=32, c=1), 0.5)

    # integer-shift equivariance (exact for any pointwise op + our FFT ops)
    y1 = filtered_nonlinearity(jnp.roll(x, 3, axis=2), "silu")
    y2 = jnp.roll(filtered_nonlinearity(x, "silu"), 3, axis=2)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)

    # half-pixel shift equivariance: wrapped act error << plain act error
    def frac_shift(img):
        return subpixel_shift(img, up=2, shift_x=0, shift_y=1)

    wrapped_err = np.abs(np.asarray(
        filtered_nonlinearity(frac_shift(x), "silu")
        - frac_shift(filtered_nonlinearity(x, "silu")))).mean()
    plain_err = np.abs(np.asarray(
        jax.nn.silu(frac_shift(x)) - frac_shift(jax.nn.silu(x)))).mean()
    assert wrapped_err < plain_err * 0.15


def test_bf16_split_matmul_path(rng):
    """set_af_bf16_split: for bfloat16 activations the 2-pass operator-split
    circulant path must track the HIGHEST-precision result to ~bf16 input
    quantization, and must leave float32 inputs byte-identical (the branch
    only fires on bf16)."""
    from afldm_tpu.ops import set_af_bf16_split, set_af_precision
    from afldm_tpu.ops.ideal_lpf import filtered_nonlinearity_matmul

    x32 = _rand(rng, h=16, w=16)
    xb = jnp.asarray(x32, jnp.bfloat16)

    def run(split, prec="highest"):
        set_af_precision(prec)
        set_af_bf16_split(split)
        try:
            return np.asarray(
                filtered_nonlinearity_matmul(xb, "silu"), np.float32)
        finally:
            set_af_bf16_split(False)
            set_af_precision("highest")

    want = run(False, "highest")
    got = run(True)
    err_split = float(np.max(np.abs(got - want)))
    # the split recovers the operator's f32 precision; the intermediate
    # bf16 round-trip leaves ~input-level quantization error. (The
    # "beats 1-pass DEFAULT" comparison only exists on the MXU — CPU
    # DEFAULT is exact f32 — so it is asserted by the TPU verify driver,
    # not here.)
    assert err_split < 2e-2, err_split

    # f32 inputs: the branch must not fire — byte-identical results
    set_af_bf16_split(True)
    try:
        a = np.asarray(filtered_nonlinearity_matmul(x32, "silu"))
    finally:
        set_af_bf16_split(False)
    b = np.asarray(filtered_nonlinearity_matmul(x32, "silu"))
    np.testing.assert_array_equal(a, b)


def test_af_precision_takes_effect_after_prior_trace(rng):
    """r4 review: filtered_nonlinearity's jit cache must key on the
    af_precision / bf16-split settings read at CALL time — a module-level
    jit reading globals at trace time pinned the first trace's precision
    forever (the inner pjit cache is process-global)."""
    from afldm_tpu.ops.ideal_lpf import (
        _filtered_nonlinearity_jit, filtered_nonlinearity,
        set_af_precision, set_af_bf16_split)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    filtered_nonlinearity(x)  # trace at the default (highest)
    n0 = _filtered_nonlinearity_jit._cache_size()
    try:
        set_af_precision("high")
        filtered_nonlinearity(x)
        assert _filtered_nonlinearity_jit._cache_size() == n0 + 1
        set_af_bf16_split(True)
        filtered_nonlinearity(x.astype(jnp.bfloat16))
        filtered_nonlinearity(x.astype(jnp.bfloat16))  # cached now
        n1 = _filtered_nonlinearity_jit._cache_size()
        set_af_bf16_split(False)
        filtered_nonlinearity(x.astype(jnp.bfloat16))
        assert _filtered_nonlinearity_jit._cache_size() == n1 + 1
    finally:
        set_af_precision("highest")
        set_af_bf16_split(False)
