"""Shared Flax building blocks mirroring the diffusers modules the reference
mutates (ResnetBlock2D, deprecated-style spatial Attention, Up/Downsample2D)
plus their alias-free variants (ref afldm/af_modules/af_blocks.py).

Design inversion vs the reference (SURVEY.md §7): instead of in-place module
surgery, every block takes ``alias_free`` / ``filtered_act`` flags from the
config; the parameter tree is identical either way (the AF downsampler
reuses the original stride-2 conv weights at stride 1, af_blocks.py:128-129),
so one checkpoint serves both wirings.

Layout is NHWC; parameters are float32 with a configurable compute dtype.
"""

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import sdpa, sdpa2

from ..ops.ideal_lpf import (
    upsample_rfft,
    downsample_rfft,
)
from ..ops.pallas_kernels import filtered_act_fused


def get_timestep_embedding(timesteps, embedding_dim: int,
                           flip_sin_to_cos: bool = False,
                           downscale_freq_shift: float = 1.0,
                           scale: float = 1.0,
                           max_period: int = 10000):
    """Sinusoidal timestep embeddings, diffusers conventions (the FFHQ UNet
    uses flip_sin_to_cos=True, freq_shift=0)."""
    half_dim = embedding_dim // 2
    exponent = -np.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """linear -> silu -> linear (diffusers TimestepEmbedding)."""
    time_embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_1")(sample)
        sample = nn.silu(sample)
        sample = nn.Dense(self.time_embed_dim, dtype=self.dtype,
                          name="linear_2")(sample)
        return sample


def _act(name: str) -> Callable:
    return {
        "silu": nn.silu, "swish": nn.silu, "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "gelu": nn.gelu, "relu": nn.relu,
    }[name]


class WrappedActivation(nn.Module):
    """The reference's WarpedNonlinearity as a config-driven wrapper: when
    ``filtered``, 4D tensors go through the 2x-oversampled sandwich
    (af_blocks.py:12-28) — the fused Pallas kernel where a mode supports
    the shape, else the XLA matmul path (use
    ops.pallas_kernels.set_filtered_act_impl to force either); lower-rank
    tensors (e.g. time embeddings) always get the plain activation."""
    act_fn: str = "silu"
    filtered: bool = False

    def __call__(self, x):
        if self.filtered and x.ndim >= 4:
            return filtered_act_fused(x, self.act_fn)
        return _act(self.act_fn)(x)


class ResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D ('default' time embedding injection)."""
    out_channels: int
    use_temb: bool = True
    eps: float = 1e-6
    groups: int = 32
    act_fn: str = "silu"
    filtered_act: bool = False
    dropout: float = 0.0
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        act = WrappedActivation(self.act_fn, self.filtered_act)
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm1")(x)
        h = act(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        if self.use_temb and temb is not None:
            temb_proj = nn.Dense(self.out_channels, dtype=self.dtype,
                                 name="time_emb_proj")(act(temb))
            h = h + temb_proj[:, None, None, :]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm2")(h)
        h = act(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


class Attention(nn.Module):
    """Spatial self-attention, diffusers 'deprecated attention block' layout
    (group-norm -> to_q/to_k/to_v -> SDPA -> to_out + residual) as used by
    UNet2DModel and the VAE mid block.

    Cross-frame attention (ref pipelines/cross_frame_attn.py:54-130) is a
    pure input: ``kv_override`` is the *pre-norm* hidden state map stored
    from the reference frame; group-norm is re-applied to it before K/V
    projection (cross_frame_attn.py:86-88). ``kv_override2``/``alpha`` blend
    two stored maps for interpolation (cross_frame_attn.py:100-122). The
    pre-norm input is always returned so a STORE pass is just "keep output
    #2"."""
    num_heads: int
    eps: float = 1e-6
    groups: int = 32
    rescale_output_factor: float = 1.0
    residual: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, kv_override=None, kv_override2=None, alpha=None):
        N, H, W, C = x.shape
        stored = x.reshape(N, H * W, C)  # pre-norm map, the CFA cache entry
        residual = x

        norm = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                            dtype=self.dtype, name="group_norm")
        xn = norm(x).reshape(N, H * W, C)

        to_q = nn.Dense(C, dtype=self.dtype, name="to_q")
        to_k = nn.Dense(C, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(C, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(C, dtype=self.dtype, name="to_out_0")

        def kv_proj(override):
            kv = norm(override.reshape(override.shape[0], -1, C))
            k, v = to_k(kv), to_v(kv)
            # broadcast a smaller reference batch over the frame batch
            # AFTER norm + projection: both are per-sample, so they
            # commute with the repeat — a 17-frame interp otherwise
            # re-norms and re-projects 17 identical copies of the stored
            # map in every self-attention of every denoise step
            if k.shape[0] < N:
                reps = N // k.shape[0]
                k = jnp.repeat(k, reps, axis=0)
                v = jnp.repeat(v, reps, axis=0)
            return k, v

        q = to_q(xn)

        def attend(k, v):
            hd = C // self.num_heads

            def split(t):
                return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                                 hd).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            out = sdpa(qh, kh, vh)
            out = out.transpose(0, 2, 1, 3).reshape(N, H * W, C)
            return to_out(out)

        if kv_override is None:
            out = attend(to_k(xn), to_v(xn))
        elif kv_override2 is None:
            out = attend(*kv_proj(kv_override))
        else:
            # CFA interpolation (ref cross_frame_attn.py:100-122): blended
            # attention over two stored maps. to_out is affine and the
            # blend weights sum to 1, so blending BEFORE to_out is exact —
            # and lets the fused two-KV flash kernel produce the blend in
            # a single pass over both KV sets (ops.attention.sdpa2)
            k0, v0 = kv_proj(kv_override)
            k1, v1 = kv_proj(kv_override2)
            hd = C // self.num_heads

            def split(t):
                return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                                 hd).transpose(0, 2, 1, 3)

            a = (jnp.asarray(alpha, jnp.float32)
                 if alpha is not None else jnp.float32(0.5))
            blended = sdpa2(split(q), split(k0), split(v0), split(k1),
                            split(v1), a)
            blended = blended.transpose(0, 2, 1, 3).reshape(N, H * W, C)
            out = to_out(blended)

        out = out.reshape(N, H, W, C)
        if self.residual:
            out = out + residual
        return out / self.rescale_output_factor, stored


class Downsample2D(nn.Module):
    """diffusers Downsample2D (conv stride 2) or the alias-free variant
    (same conv at stride 1 + ideal LPF + decimate, af_blocks.py:109-152).
    Both share the parameter 'conv'."""
    out_channels: int
    padding: int = 1  # 0 -> asymmetric (0,1) pad, the VAE convention
    alias_free: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.alias_free:
            conv = nn.Conv(self.out_channels, (3, 3), strides=(1, 1),
                           padding=((1, 1), (1, 1)), dtype=self.dtype,
                           name="conv")
            return downsample_rfft(conv(x), down=2)
        pad = (((1, 1), (1, 1)) if self.padding == 1
               else ((0, 1), (0, 1)))
        conv = nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                       padding=pad, dtype=self.dtype, name="conv")
        return conv(x)


class Upsample2D(nn.Module):
    """diffusers Upsample2D (nearest 2x + conv) or alias-free (ideal FFT
    upsample + same conv, af_blocks.py:45-106)."""
    out_channels: int
    alias_free: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        if self.alias_free:
            x = upsample_rfft(x, up=2)
        else:
            x = jax.image.resize(x, (N, H * 2, W * 2, C), "nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, name="conv")(x)


class KVHelper:
    """Threads cross-frame-attention caches through nested blocks during a
    single trace: ``next()`` pops the override for the upcoming attention
    layer (or None), ``push()`` collects its pre-norm map. Plain Python —
    structure is static under jit."""

    def __init__(self, kv_in=None, kv_in2=None, alpha=None):
        self.kv_in = kv_in
        self.kv_in2 = kv_in2
        self.alpha = alpha
        self._i = 0
        self.out = []

    def take(self):
        i = self._i
        self._i += 1
        a = None if self.kv_in is None else self.kv_in[i]
        b = None if self.kv_in2 is None else self.kv_in2[i]
        return a, b

    def push(self, stored):
        self.out.append(stored)

    def collected(self):
        return tuple(self.out)
