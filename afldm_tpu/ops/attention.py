"""Scaled-dot-product attention with a fused Pallas TPU flash kernel.

The reference runs plain SDPA through torch's ``AttnProcessor2_0``
(``/root/reference/afldm/pipelines/cross_frame_attn.py:3,54`` — cuDNN
flash attention on CUDA). The XLA path here materializes the
(L_q, L_k) score matrix in HBM; at SD sizes (64x64 latents = 4096
tokens) that is 4096^2 x heads x 4 bytes ~ 0.5 GB of HBM traffic per
UNet self-attention. ``sdpa_flash`` is the TPU-native equivalent of the
reference's fused-attention dependency: an online-softmax (flash)
kernel that keeps the score block in VMEM, tiled (block_q, block_k)
over a sequential grid with running (max, sum, acc) scratch carried
across K/V blocks.

Backward is a custom VJP that recomputes the softmax with the XLA
einsum path (remat-style: no residual score matrix is stored; training
shapes in this codebase are latent-sized, where XLA wins anyway).

Dispatch mirrors ops.pallas_kernels: ``set_attention_impl("auto")``
(default) uses the flash kernel only where it is measured to win —
long self-attention sequences on TPU — and the XLA einsum elsewhere
(short/cross attention, CPU, ragged lengths).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import _interpret


# ---------------------------------------------------------------------------
# XLA reference path (the exact semantics of the model einsum-SDPA:
# f32 scores, softmax in f32, cast to v dtype for the PV matmul).
# ---------------------------------------------------------------------------

def sdpa_xla(q, k, v, scale=None):
    """q: (..., Lq, D), k/v: (..., Lk, D) -> (..., Lq, D)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("...qd,...kd->...qk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("...qk,...kd->...qd", p, v)


# ---------------------------------------------------------------------------
# Flash kernel. Grid (batch*heads, Lq/bq, Lk/bk); the K axis is the
# innermost (sequential) grid dimension, so the (m, l, acc) scratch
# persists across K blocks of one Q block: classic online softmax.
# ---------------------------------------------------------------------------

_NEG_INF = -1e30  # rows are never fully masked; a finite sentinel avoids inf-inf


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                  acc_ref, *, scale):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qb = q_ref[0]                      # (bq, D)
    kb = k_ref[0]                      # (bk, D)
    s = jax.lax.dot_general(
        qb, kb, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (bq, bk)

    m_prev = m_ref[...]                # (bq, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)             # (bq, bk) f32
    corr = jnp.exp(m_prev - m_new)     # (bq, 1)
    l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    m_ref[...] = m_new

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, D)
    acc_ref[...] = acc_ref[...] * corr + pv

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        # per-row logsumexp, the backward-pass residual (flash convention)
        lse_ref[0] = m_ref[...] + jnp.log(l_ref[...])


def _pick_block(L, block):
    """Largest power-of-two fraction of ``block`` (>=128) dividing L, or
    L itself when it fits in one block; None when nothing divides."""
    if L <= block:
        return L
    b = block
    while b >= 128:
        if L % b == 0:
            return b
        b //= 2
    return None


def _flash_3d(q, k, v, scale, block_q, block_k):
    """q: (B, Lq, D), k/v: (B, Lk, D) — B is the flattened batch*heads.
    Returns (out, lse) with lse: (B, Lq, 1) f32."""
    B, Lq, D = q.shape
    Lk = k.shape[1]
    bq = _pick_block(Lq, block_q)
    bk = _pick_block(Lk, block_k)
    assert bq is not None and bk is not None, (q.shape, k.shape)

    return pl.pallas_call(
        partial(_flash_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
                   jax.ShapeDtypeStruct((B, Lq, 1), jnp.float32)),
        grid=(B, Lq // bq, Lk // bk),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, kk: (b, i, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, kk: (b, kk, 0)),
            pl.BlockSpec((1, bk, D), lambda b, i, kk: (b, kk, 0)),
        ],
        out_specs=(pl.BlockSpec((1, bq, D), lambda b, i, kk: (b, i, 0)),
                   pl.BlockSpec((1, bq, 1), lambda b, i, kk: (b, i, 0))),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )(q, k, v)


# -- flash backward: recompute p from the saved logsumexp, accumulate over
# the opposite sequence axis in VMEM scratch (two kernels mirroring the
# forward's sequential-innermost-grid structure).

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                         dq_ref, acc_ref, *, scale):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    qb = q_ref[0]
    kb = k_ref[0]
    s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0])                        # (bq, bk)
    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, bk)
    ds = p * (dp - dl_ref[0]) * scale
    acc_ref[...] += jax.lax.dot_general(
        ds.astype(k_ref.dtype), kb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bq, D)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        dq_ref[0] = acc_ref[...].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc, *, scale):
    qq = pl.program_id(2)

    @pl.when(qq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    qb = q_ref[0]
    kb = k_ref[0]
    s = jax.lax.dot_general(qb, kb, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse_ref[0])                        # (bq, bk)
    dob = do_ref[0]
    dv_acc[...] += jax.lax.dot_general(
        p.astype(dob.dtype), dob, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bk, D)
    dp = jax.lax.dot_general(dob, v_ref[0], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - dl_ref[0]) * scale                  # (bq, bk)
    dk_acc[...] += jax.lax.dot_general(
        ds.astype(qb.dtype), qb, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (bk, D)

    @pl.when(qq == pl.num_programs(2) - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _flash_bwd_3d(q, k, v, do, lse, delta, scale, block_q, block_k):
    B, Lq, D = q.shape
    Lk = k.shape[1]
    bq = _pick_block(Lq, block_q)
    bk = _pick_block(Lk, block_k)
    assert bq is not None and bk is not None, (q.shape, k.shape)

    qspec = pl.BlockSpec((1, bq, D), lambda b, i, j: (b, i, 0))
    kspec = pl.BlockSpec((1, bk, D), lambda b, i, j: (b, j, 0))
    rowspec = pl.BlockSpec((1, bq, 1), lambda b, i, j: (b, i, 0))
    dq = pl.pallas_call(
        partial(_flash_bwd_dq_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
        grid=(B, Lq // bq, Lk // bk),
        interpret=_interpret(),
        in_specs=[qspec, kspec, kspec, qspec, rowspec, rowspec],
        out_specs=qspec,
        scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
    )(q, k, v, do, lse, delta)

    # q is the innermost (sequential) axis here; k/v blocks are the
    # revisited outputs
    qspec2 = pl.BlockSpec((1, bq, D), lambda b, j, i: (b, i, 0))
    kspec2 = pl.BlockSpec((1, bk, D), lambda b, j, i: (b, j, 0))
    rowspec2 = pl.BlockSpec((1, bq, 1), lambda b, j, i: (b, i, 0))
    dk, dv = pl.pallas_call(
        partial(_flash_bwd_dkv_kernel, scale=scale),
        out_shape=(jax.ShapeDtypeStruct((B, Lk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Lk, D), v.dtype)),
        grid=(B, Lk // bk, Lq // bq),
        interpret=_interpret(),
        in_specs=[qspec2, kspec2, kspec2, qspec2, rowspec2, rowspec2],
        out_specs=(kspec2, kspec2),
        scratch_shapes=[pltpu.VMEM((bk, D), jnp.float32),
                        pltpu.VMEM((bk, D), jnp.float32)],
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def sdpa_flash(q, k, v, scale=None, block_q=1024, block_k=1024):
    """Flash SDPA. q: (..., Lq, D), k/v: (..., Lk, D); leading dims are
    flattened into the kernel batch. Equals sdpa_xla to ~1e-6 f32.

    Default blocks (1024, 1024): winner of the bwd-inclusive sweep at the
    4096-token flagship shape (results/bench_flash_bwd_sweep.json —
    1.038x bf16 / 1.081x f32 over (512, 1024) on the full grad chain;
    fwd-only sweeps agree, results/bench_flash_sweep.json)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    lead = q.shape[:-2]
    Lq, D = q.shape[-2:]
    Lk = k.shape[-2]
    q3 = q.reshape((-1, Lq, D))
    k3 = k.reshape((-1, Lk, D))
    v3 = v.reshape((-1, Lk, D))
    out, _ = _flash_3d(q3, k3, v3, scale, block_q, block_k)
    return out.reshape(lead + (Lq, D))


def _sdpa_fwd(q, k, v, scale, block_q, block_k):
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    lead = q.shape[:-2]
    Lq, D = q.shape[-2:]
    Lk = k.shape[-2]
    q3 = q.reshape((-1, Lq, D))
    k3 = k.reshape((-1, Lk, D))
    v3 = v.reshape((-1, Lk, D))
    out, lse = _flash_3d(q3, k3, v3, scale, block_q, block_k)
    return out.reshape(lead + (Lq, D)), (q3, k3, v3, out, lse, lead)


def _sdpa_bwd(scale, block_q, block_k, res, g):
    # true flash backward: recompute p per tile from the saved logsumexp;
    # no (Lq, Lk) matrix ever materializes in HBM
    q3, k3, v3, out, lse, lead = res
    if scale is None:
        scale = 1.0 / np.sqrt(q3.shape[-1])
    Lq, D = q3.shape[-2:]
    Lk = k3.shape[-2]
    do3 = g.reshape((-1, Lq, D))
    # delta_i = sum_d dO_id * O_id (the rowsum term of dsoftmax)
    delta = jnp.sum(do3.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    dq, dk, dv = _flash_bwd_3d(q3, k3, v3, do3, lse, delta, scale,
                               block_q, block_k)
    return (dq.reshape(lead + (Lq, D)), dk.reshape(lead + (Lk, D)),
            dv.reshape(lead + (Lk, D)))


sdpa_flash.defvjp(_sdpa_fwd, _sdpa_bwd)


# ---------------------------------------------------------------------------
# Two-KV fused kernel: (1-a) * attn(q, kv0) + a * attn(q, kv1) in ONE pass.
# The CFA-interp attention (pipelines/interpolation.py, models/layers.py
# Attention kv_override2 branch — ref cross_frame_attn.py:100-122) runs two
# full attentions over the same Q; fusing shares the Q-block loads, keeps
# both online-softmax states in VMEM, and writes a single blended output
# (half the output traffic, one kernel launch instead of two + blend).
# ---------------------------------------------------------------------------

def _flash2_kernel(q_ref, k0_ref, v0_ref, k1_ref, v1_ref, a_ref, o_ref,
                   m0_ref, l0_ref, acc0_ref, m1_ref, l1_ref, acc1_ref,
                   *, scale):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        m0_ref[...] = jnp.full_like(m0_ref, _NEG_INF)
        l0_ref[...] = jnp.zeros_like(l0_ref)
        acc0_ref[...] = jnp.zeros_like(acc0_ref)
        m1_ref[...] = jnp.full_like(m1_ref, _NEG_INF)
        l1_ref[...] = jnp.zeros_like(l1_ref)
        acc1_ref[...] = jnp.zeros_like(acc1_ref)

    qb = q_ref[0]                      # (bq, D) — loaded once per kv pair

    def step(k_ref, v_ref, m_ref, l_ref, acc_ref):
        s = jax.lax.dot_general(
            qb, k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        m_prev = m_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = l_ref[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * corr + pv

    step(k0_ref, v0_ref, m0_ref, l0_ref, acc0_ref)
    step(k1_ref, v1_ref, m1_ref, l1_ref, acc1_ref)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        a = a_ref[0, 0, 0]
        o0 = acc0_ref[...] / l0_ref[...]
        o1 = acc1_ref[...] / l1_ref[...]
        o_ref[0] = ((1.0 - a) * o0 + a * o1).astype(o_ref.dtype)


def _flash2_3d(q, k0, v0, k1, v1, alpha, scale, block_q, block_k):
    B, Lq, D = q.shape
    Lk = k0.shape[1]
    bq = _pick_block(Lq, block_q)
    bk = _pick_block(Lk, block_k)
    assert bq is not None and bk is not None, (q.shape, k0.shape)
    kvspec = pl.BlockSpec((1, bk, D), lambda b, i, kk: (b, kk, 0))
    return pl.pallas_call(
        partial(_flash2_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B, Lq, D), q.dtype),
        grid=(B, Lq // bq, Lk // bk),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((1, bq, D), lambda b, i, kk: (b, i, 0)),
            kvspec, kvspec, kvspec, kvspec,
            pl.BlockSpec((1, 1, 1), lambda b, i, kk: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, i, kk: (b, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, D), jnp.float32),
        ],
    )(q, k0, v0, k1, v1, alpha)


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def sdpa2_flash(q, k0, v0, k1, v1, alpha, scale=None, block_q=512,
                block_k=1024):
    """Fused (1-alpha)*attn(q,k0,v0) + alpha*attn(q,k1,v1).

    q: (..., Lq, D); k*/v*: (..., Lk, D) (both KV sets share Lk — the CFA
    caches store same-length maps); alpha: scalar or broadcastable to the
    leading dims (per-frame interpolation weights).

    Default blocks stay (512, 1024) — unlike sdpa_flash: this kernel
    holds TWO f32 score tiles, and (1024, 1024) fails to compile (VMEM)
    at f32/D=160 on v5e (probed twice), for a measured bf16 win of only
    2.3% (results/bench_flash_sweep.json)."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    lead = q.shape[:-2]
    Lq, D = q.shape[-2:]
    Lk = k0.shape[-2]
    # broadcast alpha over the leading dims, then flatten with them: a
    # scalar covers everything, (N,) / (N,1,1) are per-frame and broadcast
    # over heads
    a = jnp.asarray(alpha, jnp.float32)
    while a.ndim > len(lead) and a.shape[-1] == 1:
        a = a[..., 0]
    a = jnp.broadcast_to(a.reshape(a.shape + (1,) * (len(lead) - a.ndim)),
                         lead or (1,))
    out = _flash2_3d(q.reshape((-1, Lq, D)), k0.reshape((-1, Lk, D)),
                     v0.reshape((-1, Lk, D)), k1.reshape((-1, Lk, D)),
                     v1.reshape((-1, Lk, D)), a.reshape((-1, 1, 1)),
                     scale, block_q, block_k)
    return out.reshape(lead + (Lq, D))


def _sdpa2_fwd(q, k0, v0, k1, v1, alpha, scale, block_q, block_k):
    return (sdpa2_flash(q, k0, v0, k1, v1, alpha, scale, block_q, block_k),
            (q, k0, v0, k1, v1, alpha))


def _sdpa2_twopass(q, k0, v0, k1, v1, alpha, attn, scale, out_dtype=None):
    """(1-alpha)*attn(q,k0,v0) + alpha*attn(q,k1,v1), blended in f32 —
    the single definition of two-pass semantics the fused kernel must
    match (used by the XLA fallback, the fused VJP, and the measurement
    knob)."""
    o0 = attn(q, k0, v0, scale)
    o1 = attn(q, k1, v1, scale)
    a = jnp.asarray(alpha, jnp.float32)
    a = a.reshape(a.shape + (1,) * (o0.ndim - a.ndim))
    out = (1.0 - a) * o0 + a * o1
    return out if out_dtype is None else out.astype(out_dtype)


def _sdpa2_bwd(scale, block_q, block_k, res, g):
    # backward = VJP through two single-KV flash attentions (each with its
    # true flash backward); costs one fused-forward recompute, which is
    # fine — the interp pipeline never differentiates this path
    q, k0, v0, k1, v1, alpha = res

    def ref(q, k0, v0, k1, v1, alpha):
        # out_dtype=q.dtype: the fused forward returns q.dtype, so the
        # incoming cotangent g is q.dtype — the recomputed reference must
        # match or jax.vjp rejects g (bf16 inputs used to raise here)
        return _sdpa2_twopass(
            q, k0, v0, k1, v1, alpha,
            lambda q, k, v, s: sdpa_flash(q, k, v, s, block_q, block_k),
            scale, out_dtype=q.dtype)

    return jax.vjp(ref, q, k0, v0, k1, v1, alpha)[1](g)


sdpa2_flash.defvjp(_sdpa2_fwd, _sdpa2_bwd)


def sdpa2_xla(q, k0, v0, k1, v1, alpha, scale=None):
    # out_dtype=q.dtype: the f32 blend must not leak f32 outputs for bf16
    # inputs — the flash paths return q.dtype, and the model downstream
    # must see one dtype regardless of which path the shape dispatched to
    return _sdpa2_twopass(q, k0, v0, k1, v1, alpha, sdpa_xla, scale,
                          out_dtype=q.dtype)


def sdpa2(q, k0, v0, k1, v1, alpha, scale=None):
    """Dispatching two-KV blended SDPA (the CFA-interp attention)."""
    if (_IMPL != "xla" and flash_supported(q.shape, k0.shape, 512, 1024)
            and k0.shape == k1.shape):
        # gate with sdpa2_flash's own (512, 1024) blocks — its default
        # differs from sdpa_flash's (two score tiles, see sdpa2_flash)
        forced = _IMPL == "flash"
        bh = int(np.prod(q.shape[:-2])) if q.ndim > 2 else 1
        long_q = q.shape[-2] >= _FLASH_MIN_Q or (
            q.shape[-2] >= _FLASH_MIN_Q_BATCHED
            and bh >= _FLASH_MIN_BATCH_HEADS)
        wins = long_q and k0.shape[-2] >= _FLASH_MIN_K
        if forced or (wins and not _interpret()):
            if not _SDPA2_FUSED:
                # measurement knob (set_sdpa2_fused): same flash kernels,
                # two passes + blend — isolates exactly the two-KV fusion.
                # out_dtype=q.dtype matches the fused kernel's output, so
                # the A/B doesn't fold a downstream cast into the delta
                return _sdpa2_twopass(q, k0, v0, k1, v1, alpha, sdpa_flash,
                                      scale, out_dtype=q.dtype)
            return sdpa2_flash(q, k0, v0, k1, v1, alpha, scale)
    if _IMPL == "flash":
        # mirror sdpa: forced flash must fail loud on unsupported shapes,
        # not silently measure/validate the XLA fallback
        raise ValueError(
            f"flash kernel unsupported for sdpa2 shapes {q.shape} x "
            f"{k0.shape} / {k1.shape}")
    return sdpa2_xla(q, k0, v0, k1, v1, alpha, scale)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

# Measured crossovers (BENCH_NOTES.md, v5e, f32): 1.68-1.74x at 4096
# tokens (SD 64x64 self-attention) at any batch, 1.38x at 1024 tokens once
# batch*heads >= ~64 (batched FFHQ denoise), a ~4% tie-or-loss below that.
# 77-token cross-attention always stays on XLA.
_FLASH_MIN_Q = 2048
_FLASH_MIN_K = 512
_FLASH_MIN_Q_BATCHED = 1024   # enough rows amortize the kernel at 1024 tokens
_FLASH_MIN_BATCH_HEADS = 64
_IMPL = "auto"
_SDPA2_FUSED = True


def set_sdpa2_fused(fused: bool):
    """Measurement knob for the two-KV CFA-interp attention: False routes
    sdpa2 through two single-KV flash passes + blend instead of the fused
    one-pass kernel. Trace-time, like set_attention_impl."""
    global _SDPA2_FUSED
    _SDPA2_FUSED = bool(fused)


def set_attention_impl(impl: str):
    """'auto' (flash where measured to win), 'xla', or 'flash' (forced).

    Trace-time knob: it is read when a function is traced, so programs
    already jitted (incl. the pipelines' cached ``_fns``) keep whatever
    dispatch they were traced with — set it before building pipelines or
    use fresh pipeline objects to re-trace."""
    global _IMPL
    assert impl in ("auto", "xla", "flash"), impl
    _IMPL = impl


def flash_supported(q_shape, k_shape, block_q=1024, block_k=1024) -> bool:
    Lq, D = q_shape[-2:]
    Lk = k_shape[-2]
    if not _interpret() and (Lq % 8 or Lk % 8):
        # sublane-unaligned block shapes (e.g. Lq=77 as one full-length
        # block) are not guaranteed to compile on the Mosaic TPU backend
        return False
    return (_pick_block(Lq, block_q) is not None
            and _pick_block(Lk, block_k) is not None and D <= 256)


def sdpa(q, k, v, scale=None):
    """Dispatching SDPA for the model attention blocks.

    q: (..., Lq, D), k/v: (..., Lk, D). 'auto' runs the Pallas flash
    kernel for long self-attention on TPU and XLA einsum-SDPA elsewhere.
    """
    if _IMPL != "xla" and flash_supported(q.shape, k.shape):
        forced = _IMPL == "flash"
        bh = int(np.prod(q.shape[:-2])) if q.ndim > 2 else 1
        long_q = q.shape[-2] >= _FLASH_MIN_Q or (
            q.shape[-2] >= _FLASH_MIN_Q_BATCHED
            and bh >= _FLASH_MIN_BATCH_HEADS)
        wins = long_q and k.shape[-2] >= _FLASH_MIN_K
        if forced or (wins and not _interpret()):
            return sdpa_flash(q, k, v, scale)
    if _IMPL == "flash":
        raise ValueError(
            f"flash kernel unsupported for shapes {q.shape} x {k.shape}")
    return sdpa_xla(q, k, v, scale)
