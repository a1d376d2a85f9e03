"""Latent-conditioned ControlNet (ref afldm/models/my_controlnet.py:16-238):
the reference replaces diffusers' pixel-space cond embedding with an
Identity + a zero-initialized ``conv_in2`` so conditioning enters in latent
space (4ch) as ``conv_in(sample) + conv_in2(cond)``
(my_controlnet.py:60-66, 164-167). Down/mid blocks mirror the SD UNet;
zero-initialized 1x1 ``controlnet_down_blocks``/``controlnet_mid_block``
produce the residuals the UNet consumes."""

from dataclasses import dataclass, field, asdict
from typing import Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from .layers import (TimestepEmbedding, get_timestep_embedding, KVHelper)
from .unet2d_condition import (CrossAttnDownBlock2D, UNetMidBlock2DCrossAttn,
                               UNet2DConditionConfig)


@dataclass
class ControlNetConfig:
    in_channels: int = 4
    conditioning_channels: int = 4  # latent-space conditioning
    down_block_types: Sequence[str] = field(default_factory=lambda: (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D"))
    block_out_channels: Sequence[int] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_head_dim: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    act_fn: str = "silu"
    downsample_padding: int = 1
    transformer_layers_per_block: int = 1
    alias_free: bool = False

    @classmethod
    def from_unet_config(cls, u: UNet2DConditionConfig,
                         alias_free: bool = None):
        return cls(in_channels=u.in_channels,
                   down_block_types=tuple(u.down_block_types),
                   block_out_channels=tuple(u.block_out_channels),
                   layers_per_block=u.layers_per_block,
                   attention_head_dim=u.attention_head_dim,
                   cross_attention_dim=u.cross_attention_dim,
                   norm_num_groups=u.norm_num_groups, norm_eps=u.norm_eps,
                   act_fn=u.act_fn, downsample_padding=u.downsample_padding,
                   transformer_layers_per_block=u.transformer_layers_per_block,
                   alias_free=(u.alias_free if alias_free is None
                               else alias_free))

    @classmethod
    def from_diffusers(cls, cfg: dict, alias_free: bool = False):
        """Build from a diffusers controlnet (or unet) config.json dict,
        keeping only the keys this latent-conditioned variant uses."""
        import dataclasses
        names = {f.name for f in dataclasses.fields(cls)}
        keep = {k: (tuple(v) if isinstance(v, list) else v)
                for k, v in cfg.items() if k in names}
        keep.setdefault("alias_free", alias_free)
        return cls(**keep)

    def to_dict(self):
        return asdict(self)


class ControlNetModel(nn.Module):
    """Returns (down_residuals: tuple, mid_residual, kv_cache)."""
    config: ControlNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps, encoder_hidden_states, cond,
                 conditioning_scale: float = 1.0, kv_in=None, kv_in2=None,
                 alpha=None, deterministic: bool = True,
                 guess_mode: bool = False):
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
        # latent conditioning through the zero-initialized conv_in2
        x = x + nn.Conv(cfg.block_out_channels[0], (3, 3),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="conv_in2")(cond)

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

        x = UNetMidBlock2DCrossAttn(
            channels=cfg.block_out_channels[-1], num_heads=heads,
            groups=cfg.norm_num_groups, eps=cfg.norm_eps, act_fn=cfg.act_fn,
            filtered_act=cfg.alias_free,
            transformer_depth=cfg.transformer_layers_per_block,
            dtype=self.dtype,
            name="mid_block")(x, temb, encoder_hidden_states, kv,
                              deterministic)

        # guess mode ramps the residual strengths logarithmically from 0.1
        # (shallowest skip) to 1.0 (mid block) before conditioning_scale —
        # the reference ControlNet's guess-mode scaling
        # (ref models/my_controlnet.py:212-231)
        if guess_mode:
            ramp = np.logspace(-1, 0, len(skips) + 1)
            scales = [float(r) * conditioning_scale for r in ramp]
        else:
            scales = [conditioning_scale] * (len(skips) + 1)

        down_res = []
        for i, s in enumerate(skips):
            r = nn.Conv(s.shape[-1], (1, 1), dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name=f"controlnet_down_blocks_{i}")(s)
            down_res.append(r * scales[i])
        mid_res = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          name="controlnet_mid_block")(x)
        return tuple(down_res), mid_res * scales[-1], kv.collected()
