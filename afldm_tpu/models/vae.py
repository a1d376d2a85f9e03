"""Flax AutoencoderKL — diffusers-compatible VAE with alias-free options
riding in the config (ref afldm/models/af_vae.py + af_api.make_af_vae,
configs/vae/model_afvae.json).

Alias-free wiring (af_api.py:34-60):
- encoder down block i: downsampler replaced when
  ``reversed(up_rescale)[i]``; activations filtered when
  ``down_filtered_act[i]``,
- both mid blocks filtered when ``mid_act``,
- decoder up block i: activations filtered when ``up_filtered_act[i]``,
  upsampler replaced when ``up_rescale[i]``,
- the final conv_act silu and conv_in/out are never wrapped.
"""

from dataclasses import dataclass, asdict
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import (ResnetBlock2D, Downsample2D, Upsample2D,
                     WrappedActivation, KVHelper)
from .unet2d import UNetMidBlock2D


@dataclass
class AutoencoderKLConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    act_fn: str = "silu"
    latent_channels: int = 4
    norm_num_groups: int = 32
    sample_size: int = 256
    scaling_factor: float = 0.18215
    use_quant_conv: bool = True
    use_post_quant_conv: bool = True
    mid_block_add_attention: bool = True
    # alias-free extras (configs/vae/model_afvae.json)
    alias_free: bool = False
    mid_act: bool = True
    down_filtered_act: Sequence[bool] = (True, True, True, True)
    up_filtered_act: Sequence[bool] = (True, True, True, True)
    up_rescale: Sequence[bool] = (True, True, True)

    @classmethod
    def from_diffusers(cls, cfg: dict, alias_free: Optional[bool] = None):
        keep = {k: v for k, v in cfg.items()
                if k in cls.__dataclass_fields__ and not k.startswith("_")}
        # precedence: explicit "alias_free" key in the dict > kwarg >
        # heuristic. The heuristic (an AF config is recognizable by its
        # extra keys) must never clobber an explicit false — a config can
        # legitimately retain AF shape keys while disabling the wiring
        # (flagship naive arm; see tests/test_config_precedence.py).
        if "alias_free" not in keep:
            if alias_free is None:
                alias_free = ("up_rescale" in cfg
                              or cfg.get("fft_rescale", False))
            keep["alias_free"] = alias_free
        return cls(**keep)

    def to_dict(self):
        return asdict(self)

    @property
    def downsample_ratio(self):
        return 2 ** (len(self.block_out_channels) - 1)


class Encoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32
    double_z: bool = True  # False for the VQ variant (models/vq.py)
    remat: bool = False  # rematerialize each resnet block in the backward

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        kv = KVHelper()  # VAE attention never uses CFA
        eps = 1e-6
        # nn.remat keeps param names identical, so checkpoints are
        # interchangeable between remat and non-remat instances
        Block = (nn.remat(ResnetBlock2D, static_argnums=(3,))
                 if self.remat else ResnetBlock2D)

        filtered = [cfg.alias_free and f for f in cfg.down_filtered_act]
        af_resample = list(reversed(
            [cfg.alias_free and r for r in cfg.up_rescale])) + [False]

        x = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(x)

        for i, out_ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            for j in range(cfg.layers_per_block):
                x = Block(
                    out_ch, use_temb=False, eps=eps,
                    groups=cfg.norm_num_groups, act_fn=cfg.act_fn,
                    filtered_act=filtered[i], dtype=self.dtype,
                    name=f"down_blocks_{i}_resnets_{j}")(x, None,
                                                         deterministic)
            if not is_final:
                x = Downsample2D(out_ch, padding=0,
                                 alias_free=af_resample[i], dtype=self.dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(x)

        x = UNetMidBlock2D(
            channels=cfg.block_out_channels[-1], head_dim=None,
            groups=cfg.norm_num_groups, eps=eps, act_fn=cfg.act_fn,
            filtered_act=cfg.alias_free and cfg.mid_act,
            add_attention=cfg.mid_block_add_attention, dtype=self.dtype,
            name="mid_block")(x, None, kv, deterministic)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = WrappedActivation(cfg.act_fn, filtered=False)(x)
        out_ch = (2 if self.double_z else 1) * cfg.latent_channels
        x = nn.Conv(out_ch, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.config
        kv = KVHelper()
        eps = 1e-6
        Block = (nn.remat(ResnetBlock2D, static_argnums=(3,))
                 if self.remat else ResnetBlock2D)

        filtered = [cfg.alias_free and f for f in cfg.up_filtered_act]
        af_resample = [cfg.alias_free and r for r in cfg.up_rescale] + [False]

        reversed_ch = list(reversed(cfg.block_out_channels))
        x = nn.Conv(reversed_ch[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(z)

        x = UNetMidBlock2D(
            channels=reversed_ch[0], head_dim=None,
            groups=cfg.norm_num_groups, eps=eps, act_fn=cfg.act_fn,
            filtered_act=cfg.alias_free and cfg.mid_act,
            add_attention=cfg.mid_block_add_attention, dtype=self.dtype,
            name="mid_block")(x, None, kv, deterministic)

        for i, out_ch in enumerate(reversed_ch):
            is_final = i == len(reversed_ch) - 1
            for j in range(cfg.layers_per_block + 1):
                x = Block(
                    out_ch, use_temb=False, eps=eps,
                    groups=cfg.norm_num_groups, act_fn=cfg.act_fn,
                    filtered_act=filtered[i], dtype=self.dtype,
                    name=f"up_blocks_{i}_resnets_{j}")(x, None, deterministic)
            if not is_final:
                x = Upsample2D(out_ch, alias_free=af_resample[i],
                               dtype=self.dtype,
                               name=f"up_blocks_{i}_upsamplers_0")(x)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = WrappedActivation(cfg.act_fn, filtered=False)(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """encode() returns (mean, logvar); use sample()/mode() to draw latents
    (the reference's DiagonalGaussianDistribution)."""
    config: AutoencoderKLConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # per-resnet-block gradient checkpointing

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype,
                               remat=self.remat)
        self.decoder = Decoder(self.config, dtype=self.dtype,
                               remat=self.remat)
        if self.config.use_quant_conv:
            self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1),
                                      dtype=self.dtype)
        if self.config.use_post_quant_conv:
            self.post_quant_conv = nn.Conv(self.config.latent_channels,
                                           (1, 1), dtype=self.dtype)

    def encode(self, x, deterministic: bool = True):
        h = self.encoder(x, deterministic)
        if self.config.use_quant_conv:
            h = self.quant_conv(h)
        mean, logvar = jnp.split(h, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean, logvar

    def decode(self, z, deterministic: bool = True):
        if self.config.use_post_quant_conv:
            z = self.post_quant_conv(z)
        return self.decoder(z, deterministic)

    def __call__(self, x, key=None, sample_posterior: bool = False,
                 deterministic: bool = True):
        mean, logvar = self.encode(x, deterministic)
        if sample_posterior:
            z = gaussian_sample(key, mean, logvar)
        else:
            z = mean
        return self.decode(z, deterministic), mean, logvar


def gaussian_sample(key, mean, logvar):
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def gaussian_kl(mean, logvar):
    """KL(q || N(0, I)) summed over non-batch dims, averaged over batch —
    the reference's posterior.kl() reduction (vae_trainer.py KL term)."""
    kl = 0.5 * (mean ** 2 + jnp.exp(logvar) - 1.0 - logvar)
    return kl.sum(axis=tuple(range(1, kl.ndim))).mean()
