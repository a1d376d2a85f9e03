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


def test_bf16_path(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 16)), jnp.bfloat16)
    out = jax.jit(lambda z: filtered_act_pallas(z, "silu"))(x)
    assert out.dtype == jnp.bfloat16
    ref = filtered_nonlinearity(x.astype(jnp.float32), "silu", impl="matmul")
    assert float(jnp.abs(out.astype(jnp.float32) - ref).max()) < 0.05
