"""Flax UNet2DModel — diffusers-compatible architecture (the FFHQ AF-LDM
backbone, configs/ldm/model_unet.json) with config-driven alias-free
resampling and filtered activations (the reference mutates diffusers modules
in place via make_af_unet, afldm/af_modules/af_api.py:70-83).

Cross-frame attention is an explicit cache: the forward pass returns the
pre-norm hidden map of every self-attention layer (STORE), and accepts a
tuple of such maps to use as K/V sources (LOAD) — replacing the reference's
stateful CrossFrameAttnProcessor (pipelines/cross_frame_attn.py:54-130).

Supported block types: (Attn)DownBlock2D / (Attn)UpBlock2D, 'conv'
up/downsampling — the full surface the reference exercises.
"""

from dataclasses import dataclass, field, asdict
from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .layers import (
    ResnetBlock2D, Attention, Downsample2D, Upsample2D,
    TimestepEmbedding, get_timestep_embedding, WrappedActivation, KVHelper,
)


@dataclass
class UNet2DConfig:
    sample_size: int = 32
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Sequence[str] = field(default_factory=lambda: (
        "AttnDownBlock2D", "AttnDownBlock2D", "AttnDownBlock2D",
        "AttnDownBlock2D", "DownBlock2D"))
    up_block_types: Sequence[str] = field(default_factory=lambda: (
        "UpBlock2D", "AttnUpBlock2D", "AttnUpBlock2D", "AttnUpBlock2D",
        "AttnUpBlock2D"))
    block_out_channels: Sequence[int] = (192, 384, 384, 768, 768)
    layers_per_block: int = 2
    attention_head_dim: int = 24
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    act_fn: str = "silu"
    downsample_padding: int = 1
    add_attention: bool = True
    dropout: float = 0.0
    flip_sin_to_cos: bool = True
    freq_shift: int = 0
    # alias-free switches (reference: make_af_unet wraps every block)
    alias_free: bool = False
    # independent override for the activation sandwich: None follows
    # alias_free; setting it lets ablations separate the filtered-act cost
    # from the FFT resamplers (roofline attribution)
    filtered_act: Optional[bool] = None

    def resolved_filtered_act(self) -> bool:
        return self.alias_free if self.filtered_act is None \
            else self.filtered_act

    @classmethod
    def from_diffusers(cls, cfg: dict, alias_free: bool = False):
        keep = {k: v for k, v in cfg.items()
                if k in cls.__dataclass_fields__ and not k.startswith("_")}
        return cls(**keep, **({"alias_free": alias_free}
                              if "alias_free" not in keep else {}))

    def to_dict(self):
        return asdict(self)


class AttnDownBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    head_dim: int
    groups: int
    eps: float
    act_fn: str
    filtered_act: bool
    alias_free: bool
    add_downsample: bool
    downsample_padding: int
    use_attention: bool
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, kv: KVHelper, deterministic=True):
        skips = []
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, eps=self.eps,
                              groups=self.groups, act_fn=self.act_fn,
                              filtered_act=self.filtered_act,
                              dropout=self.dropout, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb, deterministic)
            if self.use_attention:
                kv1, kv2 = kv.take()
                x, stored = Attention(
                    num_heads=self.out_channels // self.head_dim,
                    eps=self.eps, groups=self.groups, dtype=self.dtype,
                    name=f"attentions_{i}")(x, kv1, kv2, kv.alpha)
                kv.push(stored)
            skips.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels,
                             padding=self.downsample_padding,
                             alias_free=self.alias_free, dtype=self.dtype,
                             name="downsamplers_0")(x)
            skips.append(x)
        return x, skips


class AttnUpBlock2D(nn.Module):
    out_channels: int
    num_layers: int
    head_dim: int
    groups: int
    eps: float
    act_fn: str
    filtered_act: bool
    alias_free: bool
    add_upsample: bool
    use_attention: bool
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, kv: KVHelper, deterministic=True):
        for i in range(self.num_layers):
            res = skips[-1]
            skips = skips[:-1]
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock2D(self.out_channels, eps=self.eps,
                              groups=self.groups, act_fn=self.act_fn,
                              filtered_act=self.filtered_act,
                              dropout=self.dropout, dtype=self.dtype,
                              name=f"resnets_{i}")(x, temb, deterministic)
            if self.use_attention:
                kv1, kv2 = kv.take()
                x, stored = Attention(
                    num_heads=self.out_channels // self.head_dim,
                    eps=self.eps, groups=self.groups, dtype=self.dtype,
                    name=f"attentions_{i}")(x, kv1, kv2, kv.alpha)
                kv.push(stored)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, alias_free=self.alias_free,
                           dtype=self.dtype, name="upsamplers_0")(x)
        return x


class UNetMidBlock2D(nn.Module):
    """resnet -> (attention) -> resnet (shared by UNet2DModel and the VAE;
    the VAE instantiates it with a single full-channel head)."""
    channels: int
    head_dim: Optional[int]  # None -> single head over all channels
    groups: int
    eps: float
    act_fn: str
    filtered_act: bool
    add_attention: bool = True
    attn_groups: Optional[int] = None
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, kv: KVHelper, deterministic=True):
        x = ResnetBlock2D(self.channels, eps=self.eps, groups=self.groups,
                          act_fn=self.act_fn, filtered_act=self.filtered_act,
                          dropout=self.dropout, dtype=self.dtype,
                          name="resnets_0")(x, temb, deterministic)
        if self.add_attention:
            head_dim = self.head_dim or self.channels
            kv1, kv2 = kv.take()
            x, stored = Attention(
                num_heads=self.channels // head_dim, eps=self.eps,
                groups=self.attn_groups or self.groups, dtype=self.dtype,
                name="attentions_0")(x, kv1, kv2, kv.alpha)
            kv.push(stored)
        x = ResnetBlock2D(self.channels, eps=self.eps, groups=self.groups,
                          act_fn=self.act_fn, filtered_act=self.filtered_act,
                          dropout=self.dropout, dtype=self.dtype,
                          name="resnets_1")(x, temb, deterministic)
        return x


class UNet2DModel(nn.Module):
    """Returns ``(eps_prediction, kv_cache)``; pass ``kv_in`` (a cache from a
    previous STORE pass) to run cross-frame attention."""
    config: UNet2DConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, kv_in=None, kv_in2=None,
                 alpha=None, deterministic: bool = True):
        cfg = self.config
        kv = KVHelper(kv_in, kv_in2, alpha)

        if jnp.ndim(timesteps) == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        t_emb = get_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            downscale_freq_shift=cfg.freq_shift).astype(self.dtype)
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                 dtype=self.dtype,
                                 name="time_embedding")(t_emb)

        x = nn.Conv(cfg.block_out_channels[0], (3, 3),
                    padding=((1, 1), (1, 1)), dtype=self.dtype,
                    name="conv_in")(sample)

        skips = [x]
        out_ch = cfg.block_out_channels[0]
        for i, btype in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            is_final = i == len(cfg.down_block_types) - 1
            x, block_skips = AttnDownBlock2D(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                head_dim=cfg.attention_head_dim,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                act_fn=cfg.act_fn, filtered_act=cfg.resolved_filtered_act(),
                alias_free=cfg.alias_free,
                add_downsample=not is_final,
                downsample_padding=cfg.downsample_padding,
                use_attention=btype.startswith("Attn"),
                dropout=cfg.dropout, dtype=self.dtype,
                name=f"down_blocks_{i}")(x, temb, kv, deterministic)
            skips.extend(block_skips)

        x = UNetMidBlock2D(
            channels=cfg.block_out_channels[-1],
            head_dim=cfg.attention_head_dim,
            groups=cfg.norm_num_groups, eps=cfg.norm_eps, act_fn=cfg.act_fn,
            filtered_act=cfg.resolved_filtered_act(), add_attention=cfg.add_attention,
            dropout=cfg.dropout, dtype=self.dtype,
            name="mid_block")(x, temb, kv, deterministic)

        reversed_ch = list(reversed(cfg.block_out_channels))
        for i, btype in enumerate(cfg.up_block_types):
            out_ch = reversed_ch[i]
            is_final = i == len(cfg.up_block_types) - 1
            n_res = cfg.layers_per_block + 1
            block_skips, skips = skips[-n_res:], skips[:-n_res]
            x = AttnUpBlock2D(
                out_channels=out_ch,
                num_layers=n_res,
                head_dim=cfg.attention_head_dim,
                groups=cfg.norm_num_groups, eps=cfg.norm_eps,
                act_fn=cfg.act_fn, filtered_act=cfg.resolved_filtered_act(),
                alias_free=cfg.alias_free,
                add_upsample=not is_final,
                use_attention=btype.startswith("Attn"),
                dropout=cfg.dropout, dtype=self.dtype,
                name=f"up_blocks_{i}")(x, block_skips, temb, kv,
                                       deterministic)

        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps,
                         dtype=self.dtype, name="conv_norm_out")(x)
        x = WrappedActivation(cfg.act_fn, filtered=False)(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_out")(x)
        return x, kv.collected()
