"""Flax VQModel — the VQ-VAE alternative autoencoder the reference's LDM
trainer supports (ldm_trainer.py:27,113-115,213-214: is_vqvae loads
diffusers' VQModel; training encodes with ``.latents`` i.e. PRE-quantize,
decode quantizes first).

diffusers layout (so torch checkpoints convert through models.convert):
encoder.* (single-z conv_out), quant_conv, quantize.embedding (codebook),
post_quant_conv, decoder.*. The encoder/decoder reuse the AutoencoderKL
modules with ``double_z=False`` on the encoder side.
"""

from dataclasses import dataclass, asdict
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .vae import AutoencoderKLConfig, Encoder, Decoder


@dataclass
class VQModelConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Sequence[int] = (128, 256, 512)
    layers_per_block: int = 2
    act_fn: str = "silu"
    latent_channels: int = 4
    vq_embed_dim: int = 4
    num_vq_embeddings: int = 256
    norm_num_groups: int = 32
    sample_size: int = 256
    scaling_factor: float = 1.0
    mid_block_add_attention: bool = True
    alias_free: bool = False

    @classmethod
    def from_diffusers(cls, cfg: dict, alias_free: bool = False):
        keep = {k: v for k, v in cfg.items()
                if k in cls.__dataclass_fields__ and not k.startswith("_")}
        keep.setdefault("alias_free", alias_free)
        return cls(**keep)

    def to_dict(self):
        return asdict(self)

    @property
    def downsample_ratio(self):
        return 2 ** (len(self.block_out_channels) - 1)

    def _kl_config(self):
        n = len(self.block_out_channels)
        return AutoencoderKLConfig(
            in_channels=self.in_channels, out_channels=self.out_channels,
            block_out_channels=tuple(self.block_out_channels),
            layers_per_block=self.layers_per_block, act_fn=self.act_fn,
            latent_channels=self.latent_channels,
            norm_num_groups=self.norm_num_groups,
            sample_size=self.sample_size,
            mid_block_add_attention=self.mid_block_add_attention,
            alias_free=self.alias_free,
            down_filtered_act=(True,) * n, up_filtered_act=(True,) * n,
            up_rescale=(True,) * (n - 1))


class VectorQuantizer(nn.Module):
    """quantize.* — nearest-codebook lookup with straight-through gradients
    (diffusers VectorQuantizer, inference path)."""
    n_e: int
    e_dim: int

    @nn.compact
    def __call__(self, z):
        # torch/diffusers VectorQuantizer init: U[-1/n, 1/n], zero-centered
        # (flax nn.initializers.uniform samples U[0, scale), which would
        # bias every codebook vector to positive mean at train start)
        emb = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / self.n_e, 1.0 / self.n_e),
            (self.n_e, self.e_dim))
        flat = z.reshape(-1, self.e_dim)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             - 2 * flat @ emb.T + jnp.sum(emb ** 2, axis=1)[None, :])
        idx = jnp.argmin(d, axis=1)
        zq = emb[idx].reshape(z.shape)
        # straight-through estimator
        zq = z + jax.lax.stop_gradient(zq - z)
        return zq, idx.reshape(z.shape[:-1])


class VQModel(nn.Module):
    """encode() returns PRE-quantize latents (diffusers .latents — what the
    LDM trainer consumes); decode() quantizes then decodes (the diffusers
    decode(force_not_quantize=False) default)."""
    config: VQModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kl = self.config._kl_config()
        self.encoder = Encoder(kl, dtype=self.dtype, double_z=False)
        self.decoder = Decoder(kl, dtype=self.dtype)
        self.quant_conv = nn.Conv(self.config.vq_embed_dim, (1, 1),
                                  dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1),
                                       dtype=self.dtype)
        self.quantize = VectorQuantizer(self.config.num_vq_embeddings,
                                        self.config.vq_embed_dim)

    def encode(self, x, deterministic: bool = True):
        h = self.encoder(x, deterministic)
        return self.quant_conv(h)

    def quantize_latents(self, z):
        return self.quantize(z)

    def decode(self, z, deterministic: bool = True,
               force_not_quantize: bool = False):
        if not force_not_quantize:
            z, _ = self.quantize(z)
        z = self.post_quant_conv(z)
        return self.decoder(z, deterministic)

    def __call__(self, x, deterministic: bool = True):
        z = self.encode(x, deterministic)
        return self.decode(z, deterministic), z
