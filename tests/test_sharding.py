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


def test_tensor_parallel_matches_data_parallel(tmp_path):
    """model_parallel=4 on a (2,4) mesh must reproduce the pure-DP losses
    (GSPMD partitions the matmuls; results equal up to reduction order)."""
    from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                                 SyntheticDataset, epoch_batches,
                                 create_trainer)
    from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig

    vae_cfg = AutoencoderKLConfig(
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, sample_size=16, scaling_factor=0.6)
    unet_cfg = UNet2DConfig(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        block_out_channels=(16, 32), layers_per_block=1,
        attention_head_dim=8, norm_num_groups=4, alias_free=True)
    sched_cfg = dict(num_train_timesteps=100, beta_schedule="scaled_linear",
                     beta_start=0.0015, beta_end=0.0195, clip_sample=False)
    ds = SyntheticDataset(resolution=16, length=32)

    def run(model_parallel):
        base = BaseTrainingConfig(
            logging_dir="logs", output_dir=str(tmp_path), resolution=16,
            train_batch_size=4, num_epochs=1, seed=0,
            model_parallel=model_parallel)
        cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                                use_shift_loss=False, use_cross_attn=False,
                                use_ema=False, learning_rate=1e-3,
                                lr_warmup_steps=0)
        tr = create_trainer("ldm", base, cfg)
        tr.init_modules(vae_config=vae_cfg, unet_config=unet_cfg,
                        scheduler_config=sched_cfg)
        tr.init_optimizers(10)
        tr.prepare_modules()
        if model_parallel > 1:
            assert tr.mesh.shape["model"] == model_parallel
            # at least one parameter actually sharded over 'model'
            shardings = jax.tree_util.tree_leaves(
                tr.state_shardings(tr.state.params))
            assert any("model" in str(s.spec) for s in shardings)
        losses = []
        for i, batch in enumerate(epoch_batches(ds, 4, seed=1)):
            losses.append(tr.training_step(i, batch)["train_loss"])
            if i >= 2:
                break
        return losses

    dp = run(1)
    tp = run(4)
    np.testing.assert_allclose(tp, dp, rtol=2e-4)


def test_fsdp_matches_data_parallel(tmp_path):
    """fsdp=True (ZeRO-3 by GSPMD annotation) must reproduce the pure-DP
    losses while actually sharding params + Adam state over 'data'."""
    from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                                 SyntheticDataset, epoch_batches,
                                 create_trainer)
    from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig

    vae_cfg = AutoencoderKLConfig(
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, sample_size=16, scaling_factor=0.6)
    unet_cfg = UNet2DConfig(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        block_out_channels=(16, 32), layers_per_block=1,
        attention_head_dim=8, norm_num_groups=4, alias_free=True)
    sched_cfg = dict(num_train_timesteps=100, beta_schedule="scaled_linear",
                     beta_start=0.0015, beta_end=0.0195, clip_sample=False)
    ds = SyntheticDataset(resolution=16, length=32)

    def run(fsdp):
        base = BaseTrainingConfig(
            logging_dir="logs", output_dir=str(tmp_path), resolution=16,
            train_batch_size=8, num_epochs=1, seed=0, fsdp=fsdp)
        cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                                use_shift_loss=False, use_cross_attn=False,
                                use_ema=True, learning_rate=1e-3,
                                lr_warmup_steps=0)
        tr = create_trainer("ldm", base, cfg)
        tr.init_modules(vae_config=vae_cfg, unet_config=unet_cfg,
                        scheduler_config=sched_cfg)
        tr.init_optimizers(10)
        tr.prepare_modules()
        if fsdp:
            # at least one parameter (and its Adam state, which follows the
            # same shape rules) actually sharded over 'data'
            shardings = jax.tree_util.tree_leaves(
                tr.state_shardings(tr.state.params))
            assert any("data" in str(s.spec) for s in shardings)
            leaves = jax.tree_util.tree_leaves(tr.state.params)
            assert any(
                next(iter(p.addressable_shards)).data.size < p.size
                for p in leaves)
        losses = []
        for i, batch in enumerate(epoch_batches(ds, 8, seed=1)):
            losses.append(tr.training_step(i, batch)["train_loss"])
            if i >= 2:
                break
        return losses

    dp = run(False)
    fs = run(True)
    np.testing.assert_allclose(fs, dp, rtol=2e-4)


def test_fsdp_tp_compose(tmp_path):
    """fsdp=True + model_parallel=2 (mesh 4x2): TP takes output channels,
    FSDP takes input channels — disjoint dims on the same kernels — and
    the losses still match pure DP."""
    from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                                 SyntheticDataset, epoch_batches,
                                 create_trainer)
    from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig

    vae_cfg = AutoencoderKLConfig(
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, sample_size=16, scaling_factor=0.6)
    unet_cfg = UNet2DConfig(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        block_out_channels=(16, 32), layers_per_block=1,
        attention_head_dim=8, norm_num_groups=4, alias_free=True)
    sched_cfg = dict(num_train_timesteps=100, beta_schedule="scaled_linear",
                     beta_start=0.0015, beta_end=0.0195, clip_sample=False)
    ds = SyntheticDataset(resolution=16, length=32)

    def run(model_parallel, fsdp):
        base = BaseTrainingConfig(
            logging_dir="logs", output_dir=str(tmp_path), resolution=16,
            train_batch_size=8, num_epochs=1, seed=0,
            model_parallel=model_parallel, fsdp=fsdp)
        cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                                use_shift_loss=False, use_cross_attn=False,
                                use_ema=False, learning_rate=1e-3,
                                lr_warmup_steps=0)
        tr = create_trainer("ldm", base, cfg)
        tr.init_modules(vae_config=vae_cfg, unet_config=unet_cfg,
                        scheduler_config=sched_cfg)
        tr.init_optimizers(10)
        tr.prepare_modules()
        if fsdp and model_parallel > 1:
            specs = [str(s.spec) for s in jax.tree_util.tree_leaves(
                tr.state_shardings(tr.state.params))]
            # at least one kernel carries BOTH axes (TP out-ch + FSDP in-ch)
            assert any("model" in s and "data" in s for s in specs)
        losses = []
        for i, batch in enumerate(epoch_batches(ds, 8, seed=1)):
            losses.append(tr.training_step(i, batch)["train_loss"])
            if i >= 2:
                break
        return losses

    dp = run(1, False)
    both = run(2, True)
    np.testing.assert_allclose(both, dp, rtol=2e-4)
