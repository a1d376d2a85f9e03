"""Smoke tests for the corrected sd_text / norm_controlnet trainers."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.train import BaseTrainingConfig, SyntheticDataset, \
    epoch_batches
from afldm_tpu.train.config import SDTextTrainingConfig, NormControlNetConfig
from afldm_tpu.train.trainer import create_trainer
from afldm_tpu.models import UNet2DConditionConfig, AutoencoderKLConfig

TINY_VAE = AutoencoderKLConfig(
    block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, sample_size=16, scaling_factor=0.6, alias_free=True,
    down_filtered_act=(False, True), up_filtered_act=(True, False),
    up_rescale=(True,))

TINY_SD = UNet2DConditionConfig(
    sample_size=8, block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
    norm_num_groups=8, alias_free=True)


class _ZeroText:
    def encode(self, prompts):
        return jnp.zeros((len(prompts), 7, 16), jnp.float32)


def _base(tmp_path):
    return BaseTrainingConfig(logging_dir="logs", output_dir=str(tmp_path),
                              resolution=16, train_batch_size=4,
                              num_epochs=1, seed=0)


def test_sd_text_trainer(tmp_path):
    cfg = SDTextTrainingConfig(af_models=True, use_shift_loss=True,
                               use_cross_attn=True, learning_rate=1e-3,
                               lr_warmup_steps=0)
    tr = create_trainer("sd_text", _base(tmp_path), cfg)
    tr.init_modules(vae_config=TINY_VAE, unet_config=TINY_SD,
                    scheduler_config=dict(num_train_timesteps=100),
                    text_encoder=_ZeroText())
    tr.init_optimizers(100)
    tr.prepare_modules()
    ds = SyntheticDataset(resolution=16, length=16)
    logs = []
    for i, b in enumerate(epoch_batches(ds, 4, seed=0)):
        logs.append(tr.training_step(i, b))
    assert all(np.isfinite(l["train_loss"]) for l in logs)
    assert all(np.isfinite(l["shift_loss"]) for l in logs)


def test_norm_controlnet_trainer_freezes_down_blocks(tmp_path):
    cfg = NormControlNetConfig(af_models=True, use_shift_loss=True,
                               learning_rate=1e-2, lr_warmup_steps=0,
                               zero_input_prob=0.4)
    tr = create_trainer("norm_controlnet", _base(tmp_path), cfg)
    tr.init_modules(vae_config=TINY_VAE, unet_config=TINY_SD)
    tr.init_optimizers(100)
    tr.prepare_modules()

    before = jax.device_get(tr.state.params)
    ds = SyntheticDataset(resolution=16, length=16)
    logs = []
    for i, b in enumerate(epoch_batches(ds, 4, seed=0)):
        b["normal"] = b["input"][:, ::-1].copy()  # synthetic pairs
        logs.append(tr.training_step(i, b))
    assert all(np.isfinite(l["train_loss"]) for l in logs)

    after = jax.device_get(tr.state.params)

    def leaf_changed(path_prefix):
        changed = []
        flat_b = jax.tree_util.tree_leaves_with_path(before)
        flat_a = jax.tree_util.tree_leaves_with_path(after)
        for (p, vb), (_, va) in zip(flat_b, flat_a):
            ks = jax.tree_util.keystr(p)
            if path_prefix in ks:
                changed.append(float(np.abs(va - vb).max()) > 0)
        return changed

    # down blocks frozen; up blocks train (ref sd_normal_controlnet.py:411-448)
    assert not any(leaf_changed("down_blocks"))
    assert any(leaf_changed("up_blocks"))
    # the controlnet optimizer stepped once per batch
    assert int(tr.cn_state.step) == len(logs)
