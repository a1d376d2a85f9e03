"""Flax UNet2DConditionModel — the SD 1.5 text-conditioned backbone in
diffusers layout (CrossAttnDown/UpBlock2D, UNetMidBlock2DCrossAttn), with
config-driven alias-free surgery (ref make_af_unet, af_api.py:70-83: wrap
resnet activations + replace resamplers in down/mid/up; transformer blocks
untouched) and explicit CFA caches on the self-attentions.

Also supports ControlNet residual injection: ``down_block_residuals`` /
``mid_block_residual`` are added to the skip connections exactly as
diffusers does for StableDiffusionControlNet pipelines."""

from dataclasses import dataclass, field, asdict
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import (ResnetBlock2D, Downsample2D, Upsample2D,
                     TimestepEmbedding, get_timestep_embedding,
                     WrappedActivation, KVHelper)
from .attention_blocks import Transformer2DModel


@dataclass
class UNet2DConditionConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Sequence[str] = field(default_factory=lambda: (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D"))
    up_block_types: Sequence[str] = field(default_factory=lambda: (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D"))
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8  # SD quirk: this is the HEAD COUNT
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    act_fn: str = "silu"
    downsample_padding: int = 1
    transformer_layers_per_block: int = 1
    alias_free: bool = False

    @classmethod
    def from_diffusers(cls, cfg: dict, alias_free: bool = False):
        keep = {k: v for k, v in cfg.items()
                if k in cls.__dataclass_fields__ and not k.startswith("_")}
        if isinstance(keep.get("attention_head_dim"), (list, tuple)):
            # SD 2.x/XL-style per-block head dims (e.g. [5,10,20,20]) —
            # fail at config load, not deep inside the first trace
            raise NotImplementedError(
                f"per-block attention_head_dim "
                f"{keep['attention_head_dim']} is not supported (SD 1.x "
                f"configs use a single int head count)")
        keep.setdefault("alias_free", alias_free)
        return cls(**keep)

    def to_dict(self):
        return asdict(self)


class CrossAttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    groups: int
    eps: float
    act_fn: str
    filtered_act: bool
    alias_free: bool
    add_downsample: bool
    downsample_padding: int
    use_attention: bool
    transformer_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ehs, kv: KVHelper, deterministic=True):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, eps=self.eps,
                              groups=self.groups, act_fn=self.act_fn,
                              filtered_act=self.filtered_act,
                              dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb, deterministic)
            if self.use_attention:
                x = Transformer2DModel(
                    self.num_heads, self.out_channels // self.num_heads,
                    depth=self.transformer_depth, groups=self.groups,
                    dtype=self.dtype, name=f"attentions_{i}")(x, ehs, kv)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels,
                             padding=self.downsample_padding,
                             alias_free=self.alias_free, dtype=self.dtype,
                             name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class CrossAttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    num_heads: int
    groups: int
    eps: float
    act_fn: str
    filtered_act: bool
    alias_free: bool
    add_upsample: bool
    use_attention: bool
    transformer_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, ehs, kv: KVHelper,
                 deterministic=True):
        for i in range(self.num_layers):
            res = skips[-1]
            skips = skips[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, eps=self.eps,
                              groups=self.groups, act_fn=self.act_fn,
                              filtered_act=self.filtered_act,
                              dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb, deterministic)
            if self.use_attention:
                x = Transformer2DModel(
                    self.num_heads, self.out_channels // self.num_heads,
                    depth=self.transformer_depth, groups=self.groups,
                    dtype=self.dtype, name=f"attentions_{i}")(x, ehs, kv)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, alias_free=self.alias_free,
                           dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNetMidBlock2DCrossAttn(nn.Module):
    channels: int
    num_heads: int
    groups: int
    eps: float
    act_fn: str
    filtered_act: bool
    transformer_depth: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ehs, kv: KVHelper, deterministic=True):
        x = ResnetBlock2D(self.channels, eps=self.eps, groups=self.groups,
                          act_fn=self.act_fn,
                          filtered_act=self.filtered_act, dtype=self.dtype,
                          name="resnets_0")(x, temb, deterministic)
        x = Transformer2DModel(
            self.num_heads, self.channels // self.num_heads,
            depth=self.transformer_depth, groups=self.groups,
            dtype=self.dtype, name="attentions_0")(x, ehs, kv)
        x = ResnetBlock2D(self.channels, eps=self.eps, groups=self.groups,
                          act_fn=self.act_fn,
                          filtered_act=self.filtered_act, dtype=self.dtype,
                          name="resnets_1")(x, temb, deterministic)
        return x


class UNet2DConditionModel(nn.Module):
    """Returns (eps, kv_cache). ``down_block_residuals`` (tuple, one per
    skip) and ``mid_block_residual`` add ControlNet outputs."""
    config: UNet2DConditionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states,
                 kv_in=None, kv_in2=None, alpha=None,
                 down_block_residuals=None, mid_block_residual=None,
                 deterministic: bool = True):
        cfg = self.config
        kv = KVHelper(kv_in, kv_in2, alpha)
        heads = cfg.attention_head_dim

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0], flip_sin_to_cos=True,
            downscale_freq_shift=0).astype(self.dtype)
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                 dtype=self.dtype,
                                 name="time_embedding")(t_emb)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(sample)

        skips = [x]
        for i, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.down_block_types) - 1
            x, block_skips = CrossAttnDownBlock2D(
                out_channels=out_ch, num_layers=cfg.layers_per_block,
                num_heads=heads, groups=cfg.norm_num_groups,
                eps=cfg.norm_eps, act_fn=cfg.act_fn,
                filtered_act=cfg.alias_free, alias_free=cfg.alias_free,
                add_downsample=not is_final,
                downsample_padding=cfg.downsample_padding,
                use_attention=btype.startswith("CrossAttn"),
                transformer_depth=cfg.transformer_layers_per_block,
                dtype=self.dtype,
                name=f"down_blocks_{i}")(x, temb, encoder_hidden_states,
                                         kv, deterministic)
            skips.extend(block_skips)

        if down_block_residuals is not None:
            skips = [s + r for s, r in zip(skips, down_block_residuals)]

        x = UNetMidBlock2DCrossAttn(
            channels=cfg.block_out_channels[-1], num_heads=heads,
            groups=cfg.norm_num_groups, eps=cfg.norm_eps, act_fn=cfg.act_fn,
            filtered_act=cfg.alias_free,
            transformer_depth=cfg.transformer_layers_per_block,
            dtype=self.dtype,
            name="mid_block")(x, temb, encoder_hidden_states, kv,
                              deterministic)
        if mid_block_residual is not None:
            x = x + mid_block_residual

        reversed_ch = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = reversed_ch[i]
            is_final = i == len(cfg.up_block_types) - 1
            n_res = cfg.layers_per_block + 1
            block_skips, skips = skips[-n_res:], skips[:-n_res]
            x = CrossAttnUpBlock2D(
                out_channels=out_ch, num_layers=n_res, num_heads=heads,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                act_fn=cfg.act_fn, filtered_act=cfg.alias_free,
                alias_free=cfg.alias_free, add_upsample=not is_final,
                use_attention=btype.startswith("CrossAttn"),
                transformer_depth=cfg.transformer_layers_per_block,
                dtype=self.dtype,
                name=f"up_blocks_{i}")(x, block_skips, temb,
                                       encoder_hidden_states, kv,
                                       deterministic)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups,
                         epsilon=cfg.norm_eps, dtype=self.dtype,
                         name="conv_norm_out")(x)
        x = WrappedActivation(cfg.act_fn, filtered=False)(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x, kv.collected()
