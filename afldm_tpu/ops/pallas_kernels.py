"""Pallas TPU kernels for the alias-free hot ops.

``filtered_act_pallas`` fuses the WarpedNonlinearity sandwich
(2x ideal upsample -> activation -> ideal LPF -> decimate,
ref af_blocks.py:12-28) into a single VMEM-resident kernel using the dense
circulant operators of ops.ideal_lpf: two MXU matmuls up, VPU activation,
two MXU matmuls down. One HBM round trip for the whole op — the
2x-resolution intermediate never leaves VMEM.

Grid: (batch, channel blocks); each program handles an (H, W, Cb) tile
with the four small operator matrices resident. Backward is a custom VJP:
dx = U^T [ s'(U x U^T) * (D^T g D^T') ] U, fused the same way (one
recompute of the cheap up-projection instead of stashing the 4x-sized
intermediate)."""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ideal_lpf import _upsample_op, _downsample_op, _ACTS, af_precision


def _act_and_grad(act):
    """Forward + hand-written derivative for every activation in _ACTS —
    the fused kernels differentiate via custom_vjp, so any act the forward
    accepts must have a grad here (a NotImplementedError would make
    training crash only at Pallas-dispatched shapes while the XLA path
    trains fine)."""
    fn = _ACTS[act]

    def grad_fn(x):
        if act in ("silu", "swish"):
            s = jax.nn.sigmoid(x)
            return s * (1 + x * (1 - s))
        if act == "leaky_relu":
            return jnp.where(x >= 0, 1.0, 0.2).astype(x.dtype)
        if act == "relu":
            return (x >= 0).astype(x.dtype)
        if act == "tanh":
            return 1 - jnp.tanh(x) ** 2
        if act == "gelu":
            # matches jax.nn.gelu's default tanh approximation
            c = np.sqrt(2.0 / np.pi).astype(np.float32)
            u = c * (x + 0.044715 * x ** 3)
            t = jnp.tanh(u)
            du = c * (1.0 + 3.0 * 0.044715 * x ** 2)
            return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t ** 2) * du
        if act == "mish":
            sp_t = jnp.tanh(jax.nn.softplus(x))
            return sp_t + x * (1.0 - sp_t ** 2) * jax.nn.sigmoid(x)
        if act == "linear":
            return jnp.ones_like(x)
        raise NotImplementedError(f"no fused grad for {act}")
    return fn, grad_fn


def _split_bf16(a):
    """bf16 hi/lo split for the manual 3-pass scheme: a ~= hi + lo with
    both addends exactly representable in bf16."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _precise_dot(dot, a, b):
    """Run ``dot`` at ideal_lpf's configured precision. Mosaic has no
    native HIGH lowering, so 'high' is the classic manual 3-pass bf16
    decomposition (ah*bh + ah*bl + al*bh ~ 2e-4 abs err, half the MXU
    passes of HIGHEST) — measured 2.8x per-op at VAE sizes where these
    kernels are MXU-bound."""
    p = af_precision()
    if p == jax.lax.Precision.HIGHEST:
        return dot(a, b, precision=jax.lax.Precision.HIGHEST)
    if p == jax.lax.Precision.HIGH:
        ah, al = _split_bf16(a)
        bh, bl = _split_bf16(b)
        return (dot(ah, bh, precision=None) + dot(ah, bl, precision=None)
                + dot(al, bh, precision=None))
    return dot(a, b, precision=None)


def _dg(a, b, a_dim, b_dim):
    def dot(x, y, precision):
        return jax.lax.dot_general(x, y, (((a_dim,), (b_dim,)), ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=precision)
    return _precise_dot(dot, a, b)


def _up_chain(x, ah, aw):
    """(H, W, C) -> (2W, 2H, C): apply A_h to rows then A_w to cols, as
    reshape/transpose-free dot_generals (Mosaic can't merge lane dims;
    channels stay in the lane dimension throughout)."""
    t = _dg(ah, x, 1, 0)   # (2H, W, C)
    return _dg(aw, t, 1, 1)  # (2W, 2H, C)


def _down_chain(t, bh, bw):
    """(2W, 2H, C) -> (H, W, C)."""
    y = _dg(bw, t, 1, 0)   # (W, 2H, C)
    return _dg(bh, y, 1, 1)  # (H, W, C)


def _interpret():
    # CPU (tests) has no Mosaic; fall back to the interpreter there
    return jax.default_backend() == "cpu"


def _choose_cblock(H, W, C):
    """Mosaic block rule: the channel (lane) block must be a multiple of
    128 or all of C. Returns None when no legal block fits the VMEM budget
    (input + both 2x intermediates + output, f32) — callers use the
    spatial-grid kernel or the XLA matmul path then."""
    budget = 10 * 1024 * 1024
    per_c = (2 * H * W + 3 * (2 * H) * (2 * W)) * 4
    if C % 128 == 0:
        legal = [128, C]
    elif _interpret():
        legal = [C]  # the CPU interpreter has no lane-tiling constraints
    else:
        # Mosaic lowers the in-kernel dot_general by folding W into the
        # lane dim — a shape cast that requires the channel block to be
        # 128-aligned ("infer-vector-layout: unsupported shape cast" for
        # e.g. (16,16,192)); non-aligned C falls back to spatial/XLA.
        return None
    for cb in sorted(set(legal)):
        if cb * per_c <= budget:
            return cb
    return None


# Measured crossovers (BENCH_NOTES.md, v5e, chained-iteration timing AND
# full-model A/B): the per-channel spatial kernel wins from ~128 px
# (1.1-1.5x per-op; 1.40x end-to-end on the 256px AF-VAE, 14.2 -> 20.0
# img/s) up to the per-channel VMEM wall at 512 px. The channel-lane
# kernel only ever ties XLA per-op at batched latent sizes and LOSES ~4%
# inside the full UNet (pallas_call is a fusion barrier; XLA fuses the
# sandwich with its neighbors), so auto-dispatch never picks it — it
# remains available via set_filtered_act_impl('pallas') / explicit mode.
_CHANNEL_MIN_BATCH = 2
_SPATIAL_MIN = 96
_SPATIAL_MAX = 512


def pallas_mode(shape):
    """Which fused kernel handles this shape: 'channel' (C in lanes, whole
    image resident), 'spatial' (per-channel, W in lanes), or None (fall
    back to the XLA matmul path). Thresholds are measured, not guessed —
    scripts/bench_filtered_act.py regenerates the table."""
    N, H, W, C = shape
    if H % 4 or W % 4:
        return None
    if N >= _CHANNEL_MIN_BATCH and _choose_cblock(H, W, C) is not None:
        return "channel"
    if (_SPATIAL_MIN <= H <= _SPATIAL_MAX and _SPATIAL_MIN <= W <= _SPATIAL_MAX
            and W % 8 == 0):
        return "spatial"
    return None


def pallas_supported(shape) -> bool:
    """True when a fused kernel can run this shape on TPU."""
    return pallas_mode(shape) is not None


def _ops_for(H, W):
    return (jnp.asarray(_upsample_op(H, 2)), jnp.asarray(_upsample_op(W, 2)),
            jnp.asarray(_downsample_op(2 * H, 2)),
            jnp.asarray(_downsample_op(2 * W, 2)))


def _forward(x, act):
    N, H, W, C = x.shape
    uh, uw, dh, dw = _ops_for(H, W)
    fn, _ = _act_and_grad(act)
    cb = _choose_cblock(H, W, C)

    def kernel(x_ref, uh_ref, uw_ref, dh_ref, dw_ref, o_ref):
        # f32 in-kernel: Mosaic matmuls need matching operand dtypes and
        # the circulant ops must run exact regardless of the model dtype
        hi = _up_chain(x_ref[...].astype(jnp.float32), uh_ref[...],
                       uw_ref[...])
        o_ref[...] = _down_chain(fn(hi), dh_ref[...], dw_ref[...]
                                 ).astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        grid=(N, C // cb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, H, W, cb), lambda n, c: (n, 0, 0, c)),
            pl.BlockSpec((2 * H, H), lambda n, c: (0, 0)),
            pl.BlockSpec((2 * W, W), lambda n, c: (0, 0)),
            pl.BlockSpec((H, 2 * H), lambda n, c: (0, 0)),
            pl.BlockSpec((W, 2 * W), lambda n, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, W, cb), lambda n, c: (n, 0, 0, c)),
    )(x, uh, uw, dh, dw)


# ---------------------------------------------------------------------------
# Spatial kernel: one (H, W) channel plane per program, W in the lane
# dimension. The whole 2x-resolution intermediate for that channel lives in
# VMEM (~(2H*2W + 2H*W)*4 bytes, e.g. 1.5 MB at 256 px), so VAE-scale maps
# run fused past the channel-lane kernel's budget. Grid (N, C) gives
# hundreds of programs; the four operator matrices have constant index maps
# and stay resident across programs.
# ---------------------------------------------------------------------------

def _spatial_ops(H, W):
    return (jnp.asarray(_upsample_op(H, 2)),          # (2H, H)
            jnp.asarray(_upsample_op(W, 2).T),        # (W, 2W)
            jnp.asarray(_downsample_op(2 * H, 2)),    # (H, 2H)
            jnp.asarray(_downsample_op(2 * W, 2).T))  # (2W, W)


def _mm(a, b):
    def dot(x, y, precision):
        return jnp.dot(x, y, preferred_element_type=jnp.float32,
                       precision=precision)
    return _precise_dot(dot, a, b)


def _forward_spatial(x, act):
    # NCHW inside the kernel: Mosaic requires the block's trailing two dims
    # to be (8,128)-aligned or the full array dims, so the (H, W) plane must
    # sit last. The two transposes are one extra base-resolution pass each —
    # cheap next to the 4x intermediates this kernel keeps out of HBM.
    N, H, W, C = x.shape
    uh, uwT, dh, dwT = _spatial_ops(H, W)
    fn, _ = _act_and_grad(act)
    xt = jnp.transpose(x, (0, 3, 1, 2))

    def kernel(x_ref, uh_ref, uwT_ref, dh_ref, dwT_ref, o_ref):
        xc = x_ref[...].astype(jnp.float32)
        hi = _mm(_mm(uh_ref[...], xc), uwT_ref[...])   # (2H, 2W)
        lo = _mm(dh_ref[...], fn(hi))                  # (H, 2W)
        o_ref[...] = _mm(lo, dwT_ref[...]).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), x.dtype),
        grid=(N, C),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, None, H, W), lambda n, c: (n, c, 0, 0)),
            pl.BlockSpec((2 * H, H), lambda n, c: (0, 0)),
            pl.BlockSpec((W, 2 * W), lambda n, c: (0, 0)),
            pl.BlockSpec((H, 2 * H), lambda n, c: (0, 0)),
            pl.BlockSpec((2 * W, W), lambda n, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, None, H, W), lambda n, c: (n, c, 0, 0)),
    )(xt, uh, uwT, dh, dwT)
    return jnp.transpose(out, (0, 2, 3, 1))


def _bwd_spatial(act, x, g):
    N, H, W, C = x.shape
    uh, uwT, dh, dwT = _spatial_ops(H, W)
    _, grad_fn = _act_and_grad(act)
    xt = jnp.transpose(x, (0, 3, 1, 2))
    gt = jnp.transpose(g, (0, 3, 1, 2))
    # pre-transposed operators (kernel-side .T would be a data transpose)
    uhT, uw, dhT, dw = uh.T, uwT.T, dh.T, dwT.T

    def kernel(x_ref, g_ref, uh_ref, uwT_ref, uhT_ref, uw_ref, dhT_ref,
               dw_ref, o_ref):
        xc = x_ref[...].astype(jnp.float32)
        gc = g_ref[...].astype(jnp.float32)
        pre = _mm(_mm(uh_ref[...], xc), uwT_ref[...])          # (2H, 2W)
        # pull g back through the linear down-projection: B_h^T g B_w
        ds = _mm(_mm(dhT_ref[...], gc), dw_ref[...])           # (2H, 2W)
        m = grad_fn(pre) * ds
        # push through the linear up-projection: A_h^T m A_w
        dx = _mm(_mm(uhT_ref[...], m), uw_ref[...])            # (H, W)
        o_ref[...] = dx.astype(o_ref.dtype)

    plane = lambda n, c: (n, c, 0, 0)  # noqa: E731
    mat = lambda n, c: (0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, C, H, W), x.dtype),
        grid=(N, C),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, None, H, W), plane),
            pl.BlockSpec((None, None, H, W), plane),
            pl.BlockSpec((2 * H, H), mat),
            pl.BlockSpec((W, 2 * W), mat),
            pl.BlockSpec((H, 2 * H), mat),
            pl.BlockSpec((2 * W, W), mat),
            pl.BlockSpec((2 * H, H), mat),
            pl.BlockSpec((W, 2 * W), mat),
        ],
        out_specs=pl.BlockSpec((None, None, H, W), plane),
    )(xt, gt, uh, uwT, uhT, uw, dhT, dw)
    return jnp.transpose(out, (0, 2, 3, 1))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def filtered_act_pallas(x, act="silu", mode=None):
    """Fused WarpedNonlinearity. x: NHWC (H, W multiples of 4; see
    pallas_mode for the shape gate — mode overrides it for tests). Equals
    ops.ideal_lpf.filtered_nonlinearity."""
    mode = mode or pallas_mode(x.shape) or "channel"
    if mode == "spatial":
        return _forward_spatial(x, act)
    return _forward(x, act)


def _fwd_rule(x, act, mode):
    return filtered_act_pallas(x, act, mode), x


def _bwd_rule(act, mode, x, g):
    mode = mode or pallas_mode(x.shape) or "channel"
    if mode == "spatial":
        return (_bwd_spatial(act, x, g),)
    N, H, W, C = x.shape
    uh, uw, dh, dw = _ops_for(H, W)
    _, grad_fn = _act_and_grad(act)
    cb = _choose_cblock(H, W, C)

    def kernel(x_ref, g_ref, uht_ref, uwt_ref, dht_ref, dwt_ref, o_ref):
        # recompute the pre-activation at 2x (operators arrive transposed;
        # transpose back with dot dimension choices, not data movement)
        xt = x_ref[...].astype(jnp.float32)
        pre = _dg(uwt_ref[...], _dg(uht_ref[...], xt, 0, 0), 0, 1)
        # pull the cotangent up through the (linear) down-projection:
        # dz = D_h^T g D_w — dht/dwt ARE the transposed operators
        g_up = _up_chain(g_ref[...].astype(jnp.float32), dht_ref[...],
                         dwt_ref[...])
        m = (grad_fn(pre) * g_up).astype(jnp.float32)
        # push back through the (linear) up-projection: dx = U_h^T m U_w
        dx = _down_chain(m, uht_ref[...], uwt_ref[...])
        o_ref[...] = dx.astype(o_ref.dtype)

    dx = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, H, W, C), x.dtype),
        grid=(N, C // cb),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, H, W, cb), lambda n, c: (n, 0, 0, c)),
            pl.BlockSpec((None, H, W, cb), lambda n, c: (n, 0, 0, c)),
            pl.BlockSpec((H, 2 * H), lambda n, c: (0, 0)),
            pl.BlockSpec((W, 2 * W), lambda n, c: (0, 0)),
            pl.BlockSpec((2 * H, H), lambda n, c: (0, 0)),
            pl.BlockSpec((2 * W, W), lambda n, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, H, W, cb), lambda n, c: (n, 0, 0, c)),
    )(x, g, uh.T, uw.T, dh.T, dw.T)
    return (dx,)


filtered_act_pallas.defvjp(_fwd_rule, _bwd_rule)


# Escape hatch for the model hot path (VERDICT r1 item 4a): "auto" runs the
# spatial Pallas kernel where it measurably wins (96-512 px) and XLA
# everywhere else — the channel kernel is NEVER auto-picked (it loses 3-4%
# in-context, see the crossover comment above); "xla" forces the ideal_lpf
# matmul/spectral path; "pallas" forces a kernel for any supported shape
# (channel incl.) and raises on unsupported ones.
_FUSED_IMPL = "auto"


def set_filtered_act_impl(impl: str):
    global _FUSED_IMPL
    assert impl in ("auto", "xla", "pallas"), impl
    _FUSED_IMPL = impl


def filtered_act_fused(x, act="silu"):
    """Dispatcher: auto = the spatial Pallas kernel at VAE sizes (where it
    wins end-to-end), XLA everywhere else — incl. batched latent sizes,
    where the channel kernel only ties per-op and loses in-context. On CPU
    backends 'auto' always uses XLA (the Pallas interpreter is orders of
    magnitude slower and only exists for correctness tests);
    impl='pallas' forces a kernel for any supported shape."""
    from .ideal_lpf import filtered_nonlinearity
    if _FUSED_IMPL != "xla" and x.ndim >= 4:
        mode = pallas_mode(x.shape)
        wanted = (mode == "spatial" if _FUSED_IMPL == "auto"
                  else mode is not None)
        if wanted and (_FUSED_IMPL == "pallas" or not _interpret()):
            return filtered_act_pallas(x, act, mode)
    if _FUSED_IMPL == "pallas":
        raise ValueError(f"pallas kernel unsupported for shape {x.shape}")
    return filtered_nonlinearity(x, act)
