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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .ideal_lpf import _upsample_op, _downsample_op, _ACTS


def _act_and_grad(act):
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
        raise NotImplementedError(f"no fused grad for {act}")
    return fn, grad_fn


def _dg(a, b, a_dim, b_dim):
    # HIGHEST: Mosaic's default f32 dot is single-pass bf16 (~1e-2 error);
    # the XLA path uses the 3-pass scheme, and parity with it matters more
    # than the ~equal runtime.
    return jax.lax.dot_general(a, b, (((a_dim,), (b_dim,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


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
    (input + both 2x intermediates + output, f32) — callers fall back to
    the XLA matmul path then."""
    budget = 10 * 1024 * 1024
    per_c = (2 * H * W + 3 * (2 * H) * (2 * W)) * 4
    legal = [C] if C % 128 else [128, C]
    for cb in sorted(set(legal)):
        if cb * per_c <= budget:
            return cb
    return None


def pallas_supported(shape) -> bool:
    """True when the fused kernel can run this shape on TPU."""
    _, H, W, C = shape
    if H % 4 or W % 4:
        return False
    return _choose_cblock(H, W, C) is not None


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
        hi = _up_chain(x_ref[...], uh_ref[...], uw_ref[...])
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


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def filtered_act_pallas(x, act="silu"):
    """Fused WarpedNonlinearity. x: NHWC (H, W multiples of 4, C a multiple
    of a supported block). Equals ops.ideal_lpf.filtered_nonlinearity."""
    return _forward(x, act)


def _fwd_rule(x, act):
    return _forward(x, act), x


def _bwd_rule(act, x, g):
    N, H, W, C = x.shape
    uh, uw, dh, dw = _ops_for(H, W)
    _, grad_fn = _act_and_grad(act)
    cb = _choose_cblock(H, W, C)

    def kernel(x_ref, g_ref, uht_ref, uwt_ref, dht_ref, dwt_ref, o_ref):
        # recompute the pre-activation at 2x (operators arrive transposed;
        # transpose back with dot dimension choices, not data movement)
        xt = x_ref[...]
        pre = _dg(uwt_ref[...], _dg(uht_ref[...], xt, 0, 0), 0, 1)
        # pull the cotangent up through the (linear) down-projection:
        # dz = D_h^T g D_w — dht/dwt ARE the transposed operators
        g_up = _up_chain(g_ref[...], dht_ref[...], dwt_ref[...])
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


def filtered_act_fused(x, act="silu"):
    """Dispatcher: the fused Pallas kernel where it fits (UNet latent
    resolutions), else the XLA matmul path (VAE-scale maps)."""
    from .ideal_lpf import filtered_nonlinearity
    if x.ndim >= 4 and pallas_supported(x.shape):
        return filtered_act_pallas(x, act)
    return filtered_nonlinearity(x, act)
