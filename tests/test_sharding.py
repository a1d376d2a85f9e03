"""Multi-device (8 virtual CPU) sharding tests — the DP story of SURVEY.md
§2.11: batch sharded over a ('data','model') mesh, params replicated, grad
reduction compiled in by XLA."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_eight_devices_available():
    assert jax.device_count() >= 8


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dp_grads_match_single_device(rng):
    """A data-parallel loss grad over the mesh must equal the single-device
    grad on the full batch."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from afldm_tpu.models import UNet2DModel, UNet2DConfig

    cfg = UNet2DConfig(
        sample_size=8, down_block_types=("DownBlock2D",),
        up_block_types=("UpBlock2D",), block_out_channels=(16,),
        layers_per_block=1, attention_head_dim=8, norm_num_groups=8,
        add_attention=False)
    unet = UNet2DModel(cfg)
    x = jnp.asarray(rng.standard_normal((8, 8, 8, 4)), jnp.float32)
    t = jnp.zeros((8,), jnp.int32)
    params = unet.init(jax.random.PRNGKey(0), x, t)

    def loss(p, xb, tb):
        eps, _ = unet.apply(p, xb, tb)
        return jnp.mean(eps ** 2)

    g_single = jax.grad(loss)(params, x, t)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    dsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())
    with mesh:
        xs = jax.device_put(x, dsh)
        ts = jax.device_put(t, dsh)
        ps = jax.device_put(params, rep)
        g_sharded = jax.jit(jax.grad(loss),
                            in_shardings=(rep, dsh, dsh),
                            out_shardings=rep)(ps, xs, ts)

    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_fft_ops_shard_over_batch(rng):
    """The FFT alias-free ops are batch-elementwise: under a batch-sharded
    input they must run without resharding and match the replicated
    result."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from afldm_tpu.ops import filtered_nonlinearity

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 4)), jnp.float32)
    want = filtered_nonlinearity(x, "silu")
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    with mesh:
        got = jax.jit(lambda z: filtered_nonlinearity(z, "silu"))(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
