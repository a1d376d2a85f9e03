"""Ideal (rect) low-pass filtering, FFT resampling and sub-pixel shifts.

TPU-native reimplementation of the alias-free signal-processing core of the
reference (``afldm/af_libs/ideal_lpf.py:12-172``). Behavioral contract:

- ``create_lpf_rect(N, cutoff)``: 1D rect mask over full-FFT bin indices,
  keeping ``[0 .. cutoff_low]`` and ``[N-cutoff_low .. N-1]`` where
  ``cutoff_low = int((N*cutoff)//2)``; when ``N % 4 == 0`` the band-edge
  bins are zeroed (ideal_lpf.py:12-24).
- ``create_recon_rect``: same but band-edge bins get 0.5 when ``N % 4 == 0``
  (ideal_lpf.py:38-49).
- ``upsample_rfft``: zero-stuff by ``up`` then apply the reconstruction
  filter and scale by ``up**2`` (ideal_lpf.py:137-158).
- ``subpixel_shift``: upsample, integer roll by ``(-shift_x, -shift_y)`` on
  (H, W), decimate (ideal_lpf.py:161-172).

Design differences from the reference (results are numerically identical,
verified by tests against the literal zero-stuff algorithm):

- **Layout is NHWC** (TPU conv layout); spatial axes are (1, 2).
- The hot paths do **spectral zero-padding / spectral folding** instead of
  materializing the zero-stuffed signal and running FFTs at the oversampled
  resolution. Upsampling by ``u`` costs one rfft2 at base resolution + one
  irfft2 at ``u``x instead of a memory-bound zero-stuff + two FFTs at
  ``u``x. Low-pass + decimate costs rfft2 at base + irfft2 at 1/2x.
- FFTs always run in float32 (TPU FFT precision); inputs are cast in and
  the original dtype restored on the way out.
- Masks are numpy compile-time constants (static shapes under jit), not a
  runtime cache dict.
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Rect mask construction (compile-time, numpy)
# ---------------------------------------------------------------------------

def _rect_1d(N: int, cutoff: float, edge_value: float) -> np.ndarray:
    """1D full-FFT rect mask. ``edge_value`` is used at the band-edge bins
    when ``N % 4 == 0`` (0.0 for the analysis LPF, 0.5 for reconstruction)."""
    cutoff_low = int((N * cutoff) // 2)
    cutoff_high = int(N - cutoff_low)
    rect = np.ones(N, dtype=np.float32)
    rect[cutoff_low + 1: cutoff_high] = 0.0
    if N % 4 == 0:
        rect[cutoff_low] = edge_value
        rect[cutoff_high % N] = edge_value
    return rect


def create_lpf_rect(N: int, cutoff: float = 0.5) -> np.ndarray:
    """2D ideal low-pass rect mask (full-FFT layout), ref ideal_lpf.py:12."""
    r = _rect_1d(N, cutoff, edge_value=0.0)
    return r[:, None] * r[None, :]


def create_fixed_lpf_rect(N: int, size: int) -> np.ndarray:
    """Rect with a fixed passband of ``size`` bins, ref ideal_lpf.py:27."""
    rect = np.ones(N, dtype=np.float32)
    if size < N:
        cutoff_low = size // 2
        cutoff_high = int(N - cutoff_low)
        rect[cutoff_low + 1: cutoff_high] = 0.0
    return rect[:, None] * rect[None, :]


def create_recon_rect(N: int, cutoff: float = 0.5) -> np.ndarray:
    """Reconstruction rect (band edges 0.5 when N%4==0), ref ideal_lpf.py:38."""
    r = _rect_1d(N, cutoff, edge_value=0.5)
    return r[:, None] * r[None, :]


def _rect_masks_2d(H: int, W: int, cutoff: float, edge: float) -> np.ndarray:
    """Separable (H, W//2+1) rfft2-layout mask for possibly non-square input."""
    rh = _rect_1d(H, cutoff, edge)
    rw = _rect_1d(W, cutoff, edge)[: W // 2 + 1]
    return rh[:, None] * rw[None, :]


# ---------------------------------------------------------------------------
# Direct (mask-multiply) filters — general path, mirrors the reference
# ---------------------------------------------------------------------------

def _fft_f32(x):
    dtype = x.dtype
    return x.astype(jnp.float32), dtype


def lpf_rfft(x: jax.Array, cutoff: float = 0.5, fixed_size: int | None = None) -> jax.Array:
    """Ideal low-pass via rfft2 over NHWC spatial axes (ref LPF_RFFT,
    ideal_lpf.py:52-93). The reference builds the mask from the *last* axis
    size only (square masks); we build it per-axis so non-square inputs are
    handled exactly."""
    xf, dtype = _fft_f32(x)
    H, W = x.shape[1], x.shape[2]
    if fixed_size is not None:
        rh = create_fixed_lpf_rect(H, fixed_size)[:, 0]
        rw = create_fixed_lpf_rect(W, fixed_size)[0, : W // 2 + 1]
        mask = rh[:, None] * rw[None, :]
    else:
        mask = _rect_masks_2d(H, W, cutoff, edge=0.0)
    X = jnp.fft.rfft2(xf, axes=(1, 2))
    X = X * jnp.asarray(mask)[None, :, :, None]
    out = jnp.fft.irfft2(X, s=(H, W), axes=(1, 2))
    return out.astype(dtype)


def lpf_recon_rfft(x: jax.Array, cutoff: float = 0.5) -> jax.Array:
    """Reconstruction low-pass (band edges 0.5), ref LPF_RECON_RFFT
    (ideal_lpf.py:96-134)."""
    xf, dtype = _fft_f32(x)
    H, W = x.shape[1], x.shape[2]
    mask = _rect_masks_2d(H, W, cutoff, edge=0.5)
    X = jnp.fft.rfft2(xf, axes=(1, 2))
    X = X * jnp.asarray(mask)[None, :, :, None]
    out = jnp.fft.irfft2(X, s=(H, W), axes=(1, 2))
    return out.astype(dtype)


# ---------------------------------------------------------------------------
# Spectral zero-pad upsampling (fast path, exact)
# ---------------------------------------------------------------------------

def _spectral_pad(X: jax.Array, H: int, W: int, up: int) -> jax.Array:
    """Given X = rfft2(x) of an (N,H,Wr,C) spectrum, build the rfft2 spectrum
    of the ``up``x zero-stuffed + recon-filtered signal. Requires H, W, up
    even (always true on the live paths: power-of-two feature maps, up=2/8).

    Equivalent to: tile the spectrum ``up``x (zero-stuffing), multiply by
    create_recon_rect(up*N, 1/up), i.e. keep the base band with band-edge
    bins halved, and scale by up**2 (ref UpsampleRFFT, ideal_lpf.py:137-158).
    """
    N, _, Wr, C = X.shape
    H2, W2 = H * up, W * up
    hh, hw = H // 2, W // 2

    # Pre-scale by up**2 and halve the Nyquist row/col once; the halved
    # Nyquist row is then *reused* in both the top and bottom band (the
    # spectral split of the Nyquist bin). Built from constant masks +
    # concat/pad only — no complex scatters (which some TPU runtimes lack).
    row_scale = np.full(H, float(up * up), dtype=np.float32)
    row_scale[hh] *= 0.5
    col_scale = np.ones(Wr, dtype=np.float32)
    col_scale[hw] = 0.5
    Xs = X * jnp.asarray(row_scale[:, None] * col_scale[None, :])[None, :, :, None]

    top = Xs[:, : hh + 1]  # rows 0..hh (hh halved)
    bot = Xs[:, hh:H]      # rows hh..H-1 -> rows H2-hh..H2-1 (hh halved)
    mid = jnp.zeros((N, H2 - H - 1, Wr, C), dtype=X.dtype)
    Y = jnp.concatenate([top, mid, bot], axis=1)
    return jnp.pad(Y, ((0, 0), (0, 0), (0, W2 // 2 + 1 - Wr), (0, 0)))


# Above this edge the dense circulant operators get large and the FFT path
# wins on memory; below it the MXU matmuls are 1.3-20x faster than XLA's
# TPU FFT (measured on v5e, see PARITY/README perf notes).
_MATMUL_MAX_SIZE = 1024


def upsample_rfft(x: jax.Array, up: int = 2, factor: int = 1,
                  impl: str = "matmul") -> jax.Array:
    """Ideal (sinc) upsampling by integer ``up``; NHWC.

    ``impl='matmul'`` (default) applies dense circulant operators on the
    MXU; ``impl='spectral'`` does exact spectral zero-padding via FFT;
    ``impl='ref'`` mirrors the reference literally (zero-stuff then
    reconstruction filter then ``* up**2``, ideal_lpf.py:148-156) and also
    supports odd sizes / ``factor != 1``. All three agree to ~1e-6.
    """
    if up == 1:
        return x
    H, W = x.shape[1], x.shape[2]
    even = H % 2 == 0 and W % 2 == 0 and up % 2 == 0
    if (impl == "matmul" and factor == 1 and even
            and max(H, W) * up <= _MATMUL_MAX_SIZE):
        return _apply_sep(x, _upsample_op(H, up), _upsample_op(W, up))
    if impl in ("spectral", "matmul") and factor == 1 and even:
        xf, dtype = _fft_f32(x)
        X = jnp.fft.rfft2(xf, axes=(1, 2))
        Y = _spectral_pad(X, H, W, up)
        out = jnp.fft.irfft2(Y, s=(H * up, W * up), axes=(1, 2))
        return out.astype(dtype)
    # Literal reference algorithm.
    N, _, _, C = x.shape
    z = jnp.zeros((N, H, up, W, up, C), dtype=x.dtype)
    z = z.at[:, :, 0, :, 0, :].set(x)
    z = z.reshape(N, H * up, W * up, C)
    return lpf_recon_rfft(z, cutoff=factor / up) * (up * up)


# ---------------------------------------------------------------------------
# Spectral-fold downsampling (LPF + decimate fused, exact)
# ---------------------------------------------------------------------------

def _spectral_fold(X: jax.Array, H: int, W: int, down: int) -> jax.Array:
    """Given X = rfft2(y) at resolution (H, W), return the rfft2 spectrum of
    ``lpf_rfft(y, 1/down)[:, ::down, ::down, :]``. Requires H, W divisible
    by 2*down (live paths: power-of-two maps, down=2).

    The ideal LPF zeroes everything outside |f| < H/(2*down) including the
    band edge (H % 4 == 0 rule), so decimation aliases nothing: the output
    spectrum is the kept band scaled by 1/down per axis.
    """
    N, _, Wr, C = X.shape
    Ho, Wo = H // down, W // down
    hh, hw = Ho // 2, Wo // 2

    top = X[:, :hh]                  # rows 0..hh-1 (band edge hh zeroed)
    bot = X[:, H - hh + 1: H]        # rows H-hh+1..H-1 -> output hh+1..Ho-1
    zero_row = jnp.zeros((N, 1, Wr, C), dtype=X.dtype)
    Yfull = jnp.concatenate([top, zero_row, bot], axis=1)  # (N, Ho, Wr, C)
    Y = Yfull[:, :, : hw + 1]
    col_scale = np.full(hw + 1, 1.0 / (down * down), dtype=np.float32)
    col_scale[hw] = 0.0  # band-edge col zeroed by the ideal LPF
    return Y * jnp.asarray(col_scale)[None, None, :, None]


def downsample_rfft(x: jax.Array, down: int = 2, impl: str = "matmul") -> jax.Array:
    """Ideal low-pass then decimate: ``lpf_rfft(x, 1/down)[:, ::down, ::down]``
    fused in the spectral domain (or as dense circulant MXU operators,
    the default). This is the decimation half of the reference's
    AliasFreeDownsample2D (af_blocks.py:148-150) and WarpedNonlinearity
    (af_blocks.py:25-26)."""
    H, W = x.shape[1], x.shape[2]
    ok = H % (2 * down) == 0 and W % (2 * down) == 0
    if impl == "matmul" and ok and max(H, W) <= _MATMUL_MAX_SIZE:
        return _apply_sep(x, _downsample_op(H, down), _downsample_op(W, down))
    if impl in ("spectral", "matmul") and ok:
        xf, dtype = _fft_f32(x)
        X = jnp.fft.rfft2(xf, axes=(1, 2))
        Y = _spectral_fold(X, H, W, down)
        out = jnp.fft.irfft2(Y, s=(H // down, W // down), axes=(1, 2))
        return out.astype(dtype)
    return lpf_rfft(x, cutoff=1.0 / down)[:, ::down, ::down, :]


# ---------------------------------------------------------------------------
# Sub-pixel shift
# ---------------------------------------------------------------------------

def subpixel_shift(images: jax.Array, up: int = 2, shift_x: int = 1,
                   shift_y: int = 1) -> jax.Array:
    """Fractional shift by (shift_x/up, shift_y/up) on (H, W): ideal upsample,
    roll by (-shift_x, -shift_y), decimate (ref ideal_lpf.py:161-172; note
    the reference rolls dims (2, 3) = (H, W) of NCHW, so shift_x moves H)."""
    up_img = upsample_rfft(images, up=up)
    rolled = jnp.roll(up_img, shift=(-shift_x, -shift_y), axis=(1, 2))
    return rolled[:, ::up, ::up, :]


# ---------------------------------------------------------------------------
# Filtered (warped) nonlinearity — the hot op
# ---------------------------------------------------------------------------

def filtered_nonlinearity(x: jax.Array, act: str = "silu",
                          impl: str = "matmul") -> jax.Array:
    """2x oversample -> act -> ideal LPF(1/2) -> decimate sandwich
    (ref WarpedNonlinearity, af_blocks.py:12-28). Inputs with fewer than 4
    dims get the plain activation (af_blocks.py:20-21).

    Default backend is dense circulant operators on the MXU (measured
    1.3-20x faster than the FFT path on v5e at 32-256 px). The spectral
    path runs rfft2/irfft2 once at base resolution and once at 2x each way
    instead of the reference's two full round trips at 2x, and skips the
    zero-stuff memory pass entirely.

    The current af_precision / bf16-split settings are read HERE, at call
    time, and passed into the jitted impl as static args — a module-level
    jit that read the globals at trace time would pin the first trace's
    precision forever (the inner pjit cache is process-global, so even a
    fresh pipeline would silently reuse the stale trace).
    """
    return _filtered_nonlinearity_jit(x, act=act, impl=impl,
                                      precision=_AF_PRECISION,
                                      bf16_split=_AF_BF16_SPLIT)


@partial(jax.jit,
         static_argnames=("act", "impl", "precision", "bf16_split"))
def _filtered_nonlinearity_jit(x, act, impl, precision, bf16_split):
    act_fn = _ACTS[act]
    if x.ndim < 4:
        return act_fn(x)
    H, W = x.shape[1], x.shape[2]
    if (impl == "matmul" and H % 4 == 0 and W % 4 == 0
            and 2 * max(H, W) <= _MATMUL_MAX_SIZE):
        hi = _apply_sep(x, _upsample_op(H, 2), _upsample_op(W, 2),
                        precision, bf16_split)
        hi = act_fn(hi)
        return _apply_sep(hi, _downsample_op(2 * H, 2),
                          _downsample_op(2 * W, 2), precision, bf16_split)
    if impl in ("spectral", "matmul") and H % 4 == 0 and W % 4 == 0:
        xf, dtype = _fft_f32(x)
        X = jnp.fft.rfft2(xf, axes=(1, 2))
        Y = _spectral_pad(X, H, W, 2)
        hi = jnp.fft.irfft2(Y, s=(H * 2, W * 2), axes=(1, 2))
        hi = act_fn(hi)
        Xh = jnp.fft.rfft2(hi, axes=(1, 2))
        Z = _spectral_fold(Xh, H * 2, W * 2, 2)
        out = jnp.fft.irfft2(Z, s=(H, W), axes=(1, 2))
        return out.astype(dtype)
    x = upsample_rfft(x, up=2, impl="ref")
    x = act_fn(x)
    x = lpf_rfft(x, cutoff=0.5)
    return x[:, ::2, ::2, :]


_ACTS = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "relu": jax.nn.relu,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "leaky_relu": lambda x: jax.nn.leaky_relu(x, 0.2),
    "tanh": jnp.tanh,
    "linear": lambda x: x,
}


# ---------------------------------------------------------------------------
# MXU (matmul) backend — the ideal resampling ops are circulant linear
# operators; at latent-scale sizes a dense per-axis operator matrix on the
# systolic array beats the FFT path (which is memory/transpose bound).
# Operators are built once per size by applying the exact spectral
# algorithms to identity signals, so equality with the FFT path is
# by construction (verified in tests to ~1e-5).
# ---------------------------------------------------------------------------

_OP_CACHE = {}


def _upsample_op(N: int, up: int = 2) -> np.ndarray:
    """(up*N, N) ideal zero-pad upsampling operator (1D)."""
    key = ("up", N, up)
    if key not in _OP_CACHE:
        X = np.fft.rfft(np.eye(N, dtype=np.float32), axis=0)
        hh = N // 2
        scale = np.full(hh + 1, float(up), np.float32)
        scale[hh] *= 0.5
        Xs = X * scale[:, None]
        Y = np.zeros((up * N // 2 + 1, N), np.complex64)
        Y[: hh + 1] = Xs
        # the negative-frequency half (incl. the split Nyquist copy) is
        # implied by irfft's Hermitian symmetry — basis vectors are real.
        _OP_CACHE[key] = np.fft.irfft(Y, n=up * N, axis=0).astype(np.float32)
    return _OP_CACHE[key]


def _downsample_op(N: int, down: int = 2) -> np.ndarray:
    """(N//down, N) ideal LPF + decimate operator (1D)."""
    key = ("down", N, down)
    if key not in _OP_CACHE:
        X = np.fft.rfft(np.eye(N, dtype=np.float32), axis=0)
        No = N // down
        hh = No // 2
        Y = np.zeros((No // 2 + 1, N), np.complex64)
        Y[:hh] = X[:hh] / down
        # band edge zeroed (the ideal LPF N%4 rule)
        _OP_CACHE[key] = np.fft.irfft(Y, n=No, axis=0).astype(np.float32)
    return _OP_CACHE[key]


# MXU precision of the dense circulant operators. HIGHEST (6-pass bf16
# decomposition) matches the FFT path to ~1e-6 and is the default — the
# TPU single-pass-bf16 dot costs ~1e-2 absolute error per application,
# which would burn the 0.1 dB equivariance-parity budget. At latent sizes
# these ops are bandwidth-bound and the setting is ~free; at VAE sizes
# (>=128 px) they are MXU-bound and 'high' (3-pass, ~2e-4) trades exactness
# for throughput. filtered_nonlinearity reads the setting at CALL time
# (static jit args); direct users of the matmul ops inside their own jit
# pick it up on their next trace.
_AF_PRECISION = jax.lax.Precision.HIGHEST
_PRECISIONS = {"highest": jax.lax.Precision.HIGHEST,
               "high": jax.lax.Precision.HIGH,
               "default": jax.lax.Precision.DEFAULT}


def set_af_precision(p: str):
    """'highest' (default, exact to ~1e-6), 'high' (~2e-4, ~MXU 2x at VAE
    sizes), or 'default' (1-pass bf16, ~1e-2 per op — measured WITHIN the
    0.1 dB equivariance budget end-to-end: +0.017 dB eval PSNR and 1.30x
    on the b8 bf16 denoise step vs 'highest' on the trained pass-2 AF
    pipeline, BENCH_NOTES.md; the training knob is BaseConfig.af_precision,
    the serving knob is load_pipeline(af_precision=...))."""
    global _AF_PRECISION
    _AF_PRECISION = _PRECISIONS[p]


def af_precision():
    return _AF_PRECISION


# bf16-input fast path: with bfloat16 activations, running the f32
# circulant operators at HIGHEST promotes both matmuls (including the f32
# intermediate of the sandwich) to multi-pass f32 MXU emulation, even
# though the inputs only carry 8 mantissa bits. Splitting each operator
# into a (hi, lo) bf16 pair and summing two DEFAULT-precision passes keeps
# the operator exact to ~2^-16 relative — below the bf16 activations' own
# quantization — in 2 native MXU passes per matmul instead of 6.
# Default OFF until measured on the round-4 roofline (BENCH_NOTES.md).
_AF_BF16_SPLIT = False
_SPLIT_CACHE = {}


def set_af_bf16_split(on: bool):
    """Enable the 2-pass bf16 operator-split circulant path for bfloat16
    activations (trace-time knob, like set_af_precision)."""
    global _AF_BF16_SPLIT
    _AF_BF16_SPLIT = bool(on)


def _split_bf16(op):
    # keyed by identity; the value pins `op` so the id can never be reused
    # by a different (GC'd-then-reallocated) array, which would silently
    # return the wrong (hi, lo) pair
    k = id(op)
    if k not in _SPLIT_CACHE:
        import ml_dtypes
        hi = op.astype(ml_dtypes.bfloat16)
        lo = (op - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
        _SPLIT_CACHE[k] = (op, hi, lo)
    return _SPLIT_CACHE[k][1:]


def _einsum_split(eq, op, x):
    hi, lo = _split_bf16(op)
    kw = dict(preferred_element_type=jnp.float32,
              precision=jax.lax.Precision.DEFAULT)
    return (jnp.einsum(eq, jnp.asarray(hi), x, **kw)
            + jnp.einsum(eq, jnp.asarray(lo), x, **kw))


def _apply_sep(x, op_h, op_w, precision=None, bf16_split=None):
    """y = op_h @ x @ op_w^T over the spatial axes of NHWC, on the MXU.

    ``precision``/``bf16_split`` default to the module globals as read at
    trace time (fine for callers that retrace per pipeline); the
    filtered_nonlinearity hot path threads them through explicitly so its
    process-global jit cache keys on them."""
    if precision is None:
        precision = _AF_PRECISION
    if bf16_split is None:
        bf16_split = _AF_BF16_SPLIT
    if bf16_split and x.dtype == jnp.bfloat16:
        y = _einsum_split("Hh,nhwc->nHwc", op_h, x).astype(jnp.bfloat16)
        return _einsum_split("Ww,nhwc->nhWc", op_w, y).astype(x.dtype)
    oh = jnp.asarray(op_h)
    ow = jnp.asarray(op_w)
    y = jnp.einsum("Hh,nhwc->nHwc", oh, x,
                   preferred_element_type=jnp.float32,
                   precision=precision)
    return jnp.einsum("Ww,nhwc->nhWc", ow, y,
                      preferred_element_type=jnp.float32,
                      precision=precision).astype(x.dtype)


def upsample_rfft_matmul(x, up: int = 2):
    H, W = x.shape[1], x.shape[2]
    return _apply_sep(x, _upsample_op(H, up), _upsample_op(W, up))


def downsample_rfft_matmul(x, down: int = 2):
    H, W = x.shape[1], x.shape[2]
    return _apply_sep(x, _downsample_op(H, down), _downsample_op(W, down))


def filtered_nonlinearity_matmul(x, act: str = "silu"):
    """The WarpedNonlinearity sandwich with dense circulant operators:
    up-project both axes (MXU), activation (VPU), down-project (MXU) —
    no FFTs, no transposes."""
    act_fn = _ACTS[act]
    if x.ndim < 4:
        return act_fn(x)
    H, W = x.shape[1], x.shape[2]
    hi = _apply_sep(x, _upsample_op(H, 2), _upsample_op(W, 2))
    hi = act_fn(hi)
    return _apply_sep(hi, _downsample_op(2 * H, 2), _downsample_op(2 * W, 2))
