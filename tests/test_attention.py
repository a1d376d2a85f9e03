"""ops/attention.py: the Pallas flash-SDPA kernel vs the XLA einsum path
(reference semantics: AttnProcessor2_0 SDPA, cross_frame_attn.py:3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.ops.attention import (sdpa, sdpa_xla, sdpa_flash,
                                     flash_supported, set_attention_impl)


def _rand(shape, dtype=jnp.float32, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), dtype)


SHAPES = [
    # (B, H, Lq, Lk, D)
    (2, 3, 512, 512, 40),     # SD-like head dim, non-128 lanes
    (1, 2, 1024, 512, 64),    # ragged Lq != Lk
    (2, 1, 256, 256, 80),     # single K block (bk > Lk)
    (1, 4, 512, 1536, 24),    # FFHQ head_dim 24, 3 K blocks
]


@pytest.mark.parametrize("shape", SHAPES)
def test_flash_matches_xla(shape):
    B, H, Lq, Lk, D = shape
    q = _rand((B, H, Lq, D), seed=1)
    k = _rand((B, H, Lk, D), seed=2)
    v = _rand((B, H, Lk, D), seed=3)
    ref = sdpa_xla(q, k, v)
    out = jax.jit(sdpa_flash)(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_flash_grad_matches_xla():
    q = _rand((1, 2, 512, 40), seed=4)
    k = _rand((1, 2, 512, 40), seed=5)
    v = _rand((1, 2, 512, 40), seed=6)
    gr = jax.grad(lambda *a: (sdpa_xla(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    gf = jax.jit(jax.grad(lambda *a: (sdpa_flash(*a) ** 2).sum(),
                          (0, 1, 2)))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6, rtol=1e-4)


def test_flash_grad_multiblock_1024():
    """Grad correctness with >1 q-block AND >1 k-block at the shipped
    (1024, 1024) default (bwd-inclusive sweep winner — both bwd kernels
    iterate their revisit axes at these block sizes)."""
    q = _rand((1, 1, 2048, 16), seed=10)
    k = _rand((1, 1, 2048, 16), seed=11)
    v = _rand((1, 1, 2048, 16), seed=12)
    gr = jax.grad(lambda *a: (sdpa_xla(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    gf = jax.jit(jax.grad(
        lambda *a: (sdpa_flash(*a, None, 1024, 1024) ** 2).sum(),
        (0, 1, 2)))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-6, rtol=1e-4)


def test_flash_bf16():
    q = _rand((2, 2, 512, 40), jnp.bfloat16, seed=7)
    k = _rand((2, 2, 512, 40), jnp.bfloat16, seed=8)
    v = _rand((2, 2, 512, 40), jnp.bfloat16, seed=9)
    ref = sdpa_xla(q, k, v)
    out = jax.jit(sdpa_flash)(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_flash_custom_scale():
    q = _rand((1, 1, 256, 32), seed=10)
    k = _rand((1, 1, 256, 32), seed=11)
    v = _rand((1, 1, 256, 32), seed=12)
    ref = sdpa_xla(q, k, v, scale=0.5)
    out = jax.jit(lambda *a: sdpa_flash(*a, 0.5))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6,
                               rtol=1e-5)


def test_dispatch():
    # short sequences: auto stays on XLA (flash threshold is 2048 tokens)
    q = _rand((1, 1, 128, 16), seed=13)
    out_auto = jax.jit(sdpa)(q, q, q)
    np.testing.assert_allclose(np.asarray(out_auto),
                               np.asarray(sdpa_xla(q, q, q)), atol=1e-6)
    # forced flash runs the kernel even below the threshold
    set_attention_impl("flash")
    try:
        out = jax.jit(sdpa)(q, q, q)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(sdpa_xla(q, q, q)), atol=2e-6)
        # 1000 <= block_q=1024 runs as one full-length (8-aligned) block
        odd = _rand((1, 1, 1000, 16), seed=14)
        np.testing.assert_allclose(np.asarray(sdpa(odd, odd, odd)),
                                   np.asarray(sdpa_xla(odd, odd, odd)),
                                   atol=2e-6, rtol=1e-5)
        with pytest.raises(ValueError):
            # 2000 > 1024 and has no >=128 power-of-two-fraction divisor
            bad = _rand((1, 1, 2000, 16), seed=14)
            sdpa(bad, bad, bad)
    finally:
        set_attention_impl("auto")


def test_flash_supported_gate():
    assert flash_supported((1, 1, 4096, 40), (1, 1, 4096, 40))
    # short lengths run as a single full-length block
    assert flash_supported((1, 1, 384, 40), (1, 1, 384, 40))
    # ragged long lengths shrink the block to a dividing fraction
    assert flash_supported((1, 1, 1536, 40), (1, 1, 1536, 40))
    # 1000 <= block_q=1024: admitted as one full-length 8-aligned block
    assert flash_supported((1, 1, 1000, 40), (1, 1, 1000, 40))
    assert not flash_supported((1, 1, 2000, 40), (1, 1, 2000, 40))
    assert not flash_supported((1, 1, 4096, 300), (1, 1, 4096, 300))


def test_matches_torch_sdpa():
    """Anchor to the reference's attention semantics: diffusers
    AttnProcessor2_0 is torch.nn.functional.scaled_dot_product_attention
    (cross_frame_attn.py:3,54)."""
    import torch

    q = _rand((2, 3, 256, 40), seed=21)
    k = _rand((2, 3, 512, 40), seed=22)
    v = _rand((2, 3, 512, 40), seed=23)
    tq, tk, tv = (torch.from_numpy(np.asarray(t)) for t in (q, k, v))
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    for fn in (sdpa_xla, jax.jit(sdpa_flash)):
        out = fn(q, k, v)
        np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=2e-6,
                                   rtol=1e-4)


# -- two-KV fused CFA-interp kernel (VERDICT r2 item 5) ----------------------

def test_sdpa2_flash_matches_xla():
    from afldm_tpu.ops.attention import sdpa2_flash, sdpa2_xla
    B, H, L, D = 2, 3, 512, 40
    q = _rand((B, H, L, D), seed=1)
    k0 = _rand((B, H, L, D), seed=2)
    v0 = _rand((B, H, L, D), seed=3)
    k1 = _rand((B, H, L, D), seed=4)
    v1 = _rand((B, H, L, D), seed=5)
    for alpha in (0.0, 0.3, 1.0):
        ref = sdpa2_xla(q, k0, v0, k1, v1, alpha)
        out = jax.jit(sdpa2_flash)(q, k0, v0, k1, v1, alpha)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-6, rtol=1e-5)


def test_sdpa2_per_frame_alpha():
    """(N,) and (N,1,1) per-frame alphas (the interp pipeline's shape,
    interpolation.py:215) broadcast over heads identically."""
    from afldm_tpu.ops.attention import sdpa2_flash, sdpa2_xla
    B, H, L, D = 3, 2, 256, 32
    q = _rand((B, H, L, D), seed=1)
    k0 = _rand((B, H, L, D), seed=2)
    v0 = _rand((B, H, L, D), seed=3)
    k1 = _rand((B, H, L, D), seed=4)
    v1 = _rand((B, H, L, D), seed=5)
    a = jnp.asarray([0.0, 0.5, 1.0], jnp.float32)
    ref = sdpa2_xla(q, k0, v0, k1, v1, a[:, None, None])
    out = jax.jit(sdpa2_flash)(q, k0, v0, k1, v1, a)
    out2 = jax.jit(sdpa2_flash)(q, k0, v0, k1, v1, a[:, None, None])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               atol=3e-6, rtol=1e-5)
    # frame 0 is pure kv0 attention, frame 2 pure kv1
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(sdpa_xla(q[0], k0[0], v0[0])),
        atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out[2]), np.asarray(sdpa_xla(q[2], k1[2], v1[2])),
        atol=3e-6, rtol=1e-5)


def test_sdpa2_grad_matches_xla():
    from afldm_tpu.ops.attention import sdpa2_flash, sdpa2_xla
    q = _rand((1, 2, 256, 32), seed=6)
    k0 = _rand((1, 2, 256, 32), seed=7)
    v0 = _rand((1, 2, 256, 32), seed=8)
    k1 = _rand((1, 2, 256, 32), seed=9)
    v1 = _rand((1, 2, 256, 32), seed=10)
    a = jnp.float32(0.3)

    def loss_flash(q, k0, v0, k1, v1):
        return jnp.sum(sdpa2_flash(q, k0, v0, k1, v1, a) ** 2)

    def loss_xla(q, k0, v0, k1, v1):
        from afldm_tpu.ops.attention import sdpa2_xla
        return jnp.sum(sdpa2_xla(q, k0, v0, k1, v1, a) ** 2)

    g1 = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2, 3, 4)))(
        q, k0, v0, k1, v1)
    g2 = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))(
        q, k0, v0, k1, v1)
    for a_, b_ in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   atol=2e-4, rtol=1e-3)


def test_sdpa2_gate_uses_own_blocks():
    """sdpa admits L=1000 as one full-length 1024-block, but sdpa2's
    kernel runs (512, 1024) blocks where 1000 has no divisor — the sdpa2
    dispatcher must gate with ITS blocks (fall back / fail loud, never
    reach the kernel's block assert)."""
    from afldm_tpu.ops.attention import sdpa2, sdpa2_xla
    x = [_rand((1, 2, 1000, 16), seed=s) for s in (1, 2, 3, 4, 5)]
    a = jnp.float32(0.4)
    out = sdpa2(*x, a)      # auto: silently XLA
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(sdpa2_xla(*x, a)),
                               atol=1e-6, rtol=1e-5)
    set_attention_impl("flash")
    try:
        with pytest.raises(ValueError):
            sdpa2(*x, a)
    finally:
        set_attention_impl("auto")


def test_sdpa2_grad_bf16():
    """bf16 grads through the fused kernel: the VJP recompute must return
    q.dtype (it used to blend in f32 and reject the bf16 cotangent)."""
    from afldm_tpu.ops.attention import sdpa2_flash, sdpa2_xla
    args = [_rand((1, 2, 256, 32), jnp.bfloat16, seed=s)
            for s in (6, 7, 8, 9, 10)]
    a = jnp.float32(0.3)

    def loss(f):
        return lambda *x: jnp.sum(
            jnp.square(f(*x, a).astype(jnp.float32)))

    g1 = jax.jit(jax.grad(loss(sdpa2_flash), argnums=(0, 1, 2, 3, 4)))(
        *args)
    g2 = jax.jit(jax.grad(loss(sdpa2_xla), argnums=(0, 1, 2, 3, 4)))(
        *args)
    for a_, b_ in zip(g1, g2):
        assert a_.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(a_, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-2, rtol=1e-1)


def test_attention_block_interp_fused_path():
    """models.layers.Attention kv_override2 branch: blend-before-to_out +
    fused kernel must equal the literal two-attention blend."""
    from afldm_tpu.models.layers import Attention
    attn = Attention(num_heads=2, groups=4)
    x = _rand((2, 8, 8, 16), seed=11)
    s0 = _rand((2, 8, 8, 16), seed=12)
    s1 = _rand((2, 8, 8, 16), seed=13)
    params = attn.init(jax.random.PRNGKey(0), x)
    out, _ = attn.apply(params, x, kv_override=s0, kv_override2=s1,
                        alpha=0.25)
    # literal reference: two separate CFA attentions blended after to_out
    o0, _ = attn.apply(params, x, kv_override=s0)
    o1, _ = attn.apply(params, x, kv_override=s1)
    # outputs include the residual; blend of residuals == residual
    want = 0.75 * np.asarray(o0) + 0.25 * np.asarray(o1)
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-5)


def test_set_sdpa2_fused_knob():
    """set_sdpa2_fused(False) routes sdpa2 through two single-KV flash
    passes + blend; results must match the fused kernel and sdpa2_xla."""
    from afldm_tpu.ops.attention import (sdpa2, sdpa2_xla, set_sdpa2_fused,
                                         set_attention_impl)
    r = np.random.default_rng(5)
    shape = (2, 2, 1024, 64)
    q, k0, v0, k1, v1 = (jnp.asarray(r.standard_normal(shape), jnp.float32)
                         for _ in range(5))
    alpha = jnp.asarray([0.2, 0.8], jnp.float32)
    ref = sdpa2_xla(q, k0, v0, k1, v1, alpha[:, None, None])

    set_attention_impl("flash")  # force flash dispatch (CPU interpret mode)
    try:
        fused = jax.jit(lambda *a: sdpa2(*a))(q, k0, v0, k1, v1, alpha)
        set_sdpa2_fused(False)
        unfused = jax.jit(lambda *a: sdpa2(*a))(q, k0, v0, k1, v1, alpha)
    finally:
        set_sdpa2_fused(True)
        set_attention_impl("auto")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(unfused), np.asarray(ref),
                               atol=2e-5)


def test_sdpa2_knob_dtype_contract():
    """Fused and unfused sdpa2 return the SAME dtype for bf16 inputs
    (q.dtype), so the measurement A/B isolates the fusion, not a cast
    (the blend is computed in f32 either way; alpha is f32)."""
    from afldm_tpu.ops.attention import (sdpa2, set_sdpa2_fused,
                                         set_attention_impl)
    r = np.random.default_rng(6)
    shape = (2, 2, 256, 32)
    q, k0, v0, k1, v1 = (jnp.asarray(r.standard_normal(shape), jnp.bfloat16)
                         for _ in range(5))
    alpha = jnp.asarray([0.25, 0.75], jnp.float32)
    set_attention_impl("flash")
    try:
        fused = jax.jit(lambda *a: sdpa2(*a))(q, k0, v0, k1, v1, alpha)
        set_sdpa2_fused(False)
        unfused = jax.jit(lambda *a: sdpa2(*a))(q, k0, v0, k1, v1, alpha)
    finally:
        set_sdpa2_fused(True)
        set_attention_impl("auto")
    assert fused.dtype == jnp.bfloat16, fused.dtype
    assert unfused.dtype == jnp.bfloat16, unfused.dtype
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(unfused, np.float32),
                               atol=2e-2)


def test_sdpa2_xla_fallback_preserves_bf16():
    """r4 review: the XLA two-pass fallback leaked f32 outputs for bf16
    inputs while both flash paths return q.dtype — all three paths must
    agree so downstream dtype semantics don't depend on dispatch shape."""
    from afldm_tpu.ops.attention import sdpa2, sdpa2_xla
    r = np.random.default_rng(7)
    # short-Lk / unaligned-Lq shape: always dispatches to the XLA fallback
    q = jnp.asarray(r.standard_normal((2, 2, 77, 32)), jnp.bfloat16)
    k0, v0, k1, v1 = (jnp.asarray(r.standard_normal((2, 2, 77, 32)),
                                  jnp.bfloat16) for _ in range(4))
    out = sdpa2(q, k0, v0, k1, v1, 0.5)
    assert out.dtype == jnp.bfloat16, out.dtype
    assert sdpa2_xla(q, k0, v0, k1, v1, 0.5).dtype == jnp.bfloat16


def test_sdpa2_forced_flash_raises_on_unsupported():
    """Forced 'flash' must fail loud on unsupported sdpa2 shapes (mirrors
    sdpa), not silently measure the XLA fallback."""
    import pytest
    from afldm_tpu.ops.attention import sdpa2, set_attention_impl
    r = np.random.default_rng(8)
    q = jnp.asarray(r.standard_normal((2, 64, 32)), jnp.float32)
    # mismatched KV lengths: the fused two-KV kernel requires k0/k1 to
    # share Lk (the CFA caches do) — unsupported on every backend
    k0 = jnp.asarray(r.standard_normal((2, 64, 32)), jnp.float32)
    v0 = jnp.asarray(r.standard_normal((2, 64, 32)), jnp.float32)
    k1 = jnp.asarray(r.standard_normal((2, 128, 32)), jnp.float32)
    v1 = jnp.asarray(r.standard_normal((2, 128, 32)), jnp.float32)
    set_attention_impl("flash")
    try:
        with pytest.raises(ValueError, match="unsupported"):
            sdpa2(q, k0, v0, k1, v1, 0.5)
    finally:
        set_attention_impl("auto")
