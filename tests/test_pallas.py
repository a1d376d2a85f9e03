"""Fused Pallas filtered-activation kernel vs the reference matmul impl
(CPU runs through the Pallas interpreter; Mosaic parity is exercised by the
TPU drives/bench)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.ops.pallas_kernels import filtered_act_pallas
from afldm_tpu.ops.ideal_lpf import filtered_nonlinearity


@pytest.mark.parametrize("shape", [(2, 16, 16, 32), (1, 8, 16, 8),
                                   (1, 32, 32, 3)])
@pytest.mark.parametrize("act", ["silu", "leaky_relu"])
def test_forward_matches_reference(rng, shape, act):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = jax.jit(lambda z: filtered_act_pallas(z, act))(x)
    want = filtered_nonlinearity(x, act, impl="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5,
                               rtol=1e-4)


def test_custom_vjp_matches_autodiff(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.float32)
    g1 = jax.jit(jax.grad(
        lambda z: (filtered_act_pallas(z, "silu") ** 2).sum()))(x)
    g2 = jax.jit(jax.grad(
        lambda z: (filtered_nonlinearity(z, "silu", impl="matmul") ** 2
                   ).sum()))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5,
                               rtol=1e-4)


def test_spatial_mode_forward(rng):
    """VAE-scale maps route to the per-channel spatial kernel (on TPU the
    shape gate picks it; here the kernel is exercised directly)."""
    from afldm_tpu.ops.pallas_kernels import pallas_mode
    assert pallas_mode((1, 128, 128, 256)) == "spatial"
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 8)), jnp.float32)
    got = jax.jit(lambda z: filtered_act_pallas(z, "silu", "spatial"))(x)
    want = filtered_nonlinearity(x, "silu", impl="matmul")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5,
                               rtol=1e-4)


def test_spatial_mode_vjp(rng):
    x = jnp.asarray(rng.standard_normal((1, 64, 72, 4)), jnp.float32)
    g1 = jax.jit(jax.grad(
        lambda z: (filtered_act_pallas(z, "silu", "spatial") ** 2).sum()))(x)
    g2 = jax.jit(jax.grad(
        lambda z: (filtered_nonlinearity(z, "silu", impl="matmul") ** 2
                   ).sum()))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-5,
                               rtol=1e-4)


def test_fused_dispatcher_impl_override(rng):
    from afldm_tpu.ops.pallas_kernels import (filtered_act_fused,
                                              set_filtered_act_impl)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    want = filtered_nonlinearity(x, "silu", impl="matmul")
    try:
        for impl in ("auto", "xla", "pallas"):
            set_filtered_act_impl(impl)
            got = filtered_act_fused(x, "silu")
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=3e-5, rtol=1e-4)
        set_filtered_act_impl("pallas")
        with pytest.raises(ValueError):
            filtered_act_fused(jnp.zeros((1, 10, 10, 4)), "silu")
    finally:
        set_filtered_act_impl("auto")


def test_batch1_latent_dispatches_xla():
    """Measured policy: batch-1 latent maps stay on the XLA matmul path."""
    from afldm_tpu.ops.pallas_kernels import pallas_mode
    assert pallas_mode((1, 32, 32, 768)) is None
    assert pallas_mode((8, 32, 32, 768)) == "channel"


def test_bf16_path(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.bfloat16)
    out = jax.jit(lambda z: filtered_act_pallas(z, "silu"))(x)
    assert out.dtype == jnp.bfloat16
    ref = filtered_nonlinearity(x.astype(jnp.float32), "silu", impl="matmul")
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 0.05


def test_af_precision_switch():
    """set_af_precision reconfigures the circulant-matmul precision; on
    CPU (native f32 dots) every level is exact, so this asserts the API
    and the trace-time plumbing, not the TPU error ladder (measured in
    BENCH_NOTES.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from afldm_tpu.ops import set_af_precision, filtered_nonlinearity
    from afldm_tpu.ops.ideal_lpf import af_precision

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 16, 8)),
                    jnp.float32)
    ref = filtered_nonlinearity(x, "silu", impl="matmul")
    try:
        set_af_precision("high")
        assert af_precision() == jax.lax.Precision.HIGH
        out = jax.jit(
            lambda v: filtered_nonlinearity(v, "silu", impl="matmul"))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5)
        import pytest
        with pytest.raises(KeyError):
            set_af_precision("bogus")
    finally:
        set_af_precision("highest")


def test_af_precision_high_three_pass_kernel():
    """'high' inside the Pallas kernels is a manual 3-pass bf16 split
    (Mosaic has no native HIGH); it must stay within ~1e-3 of the exact
    HIGHEST kernel on well-scaled inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from afldm_tpu.ops import set_af_precision
    from afldm_tpu.ops.pallas_kernels import filtered_act_pallas

    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 96, 96, 4)),
        jnp.float32)
    ref = jax.jit(lambda v: filtered_act_pallas(v, "silu", "spatial"))(x)
    try:
        set_af_precision("high")
        out = jax.jit(
            lambda v, _p="h": filtered_act_pallas(v, "silu", "spatial"))(x)
        err = float(jnp.abs(out - ref).max())
        assert err < 1e-3, err
        g = jax.jit(jax.grad(
            lambda v: (filtered_act_pallas(v, "silu", "spatial") ** 2
                       ).sum()))(x)
        assert bool(jnp.isfinite(g).all())
    finally:
        set_af_precision("highest")


@pytest.mark.parametrize("act", ["gelu", "mish", "linear"])
def test_fused_grad_all_acts(rng, act):
    """r4 review: every activation the fused forward accepts must have a
    hand-written gradient — gelu/mish/linear used to raise
    NotImplementedError only at Pallas-dispatched shapes during training."""
    from afldm_tpu.ops.pallas_kernels import filtered_act_pallas
    from afldm_tpu.ops.ideal_lpf import filtered_nonlinearity
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.float32)
    g_pallas = jax.grad(
        lambda a: filtered_act_pallas(a, act, "channel").sum())(x)
    g_xla = jax.grad(lambda a: filtered_nonlinearity(a, act).sum())(x)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_xla),
                               atol=2e-4)
