"""Transformer attention blocks for the SD-family UNets (diffusers
Transformer2DModel / BasicTransformerBlock layout, SD 1.5 flavor:
conv 1x1 projections, GEGLU feed-forward, LayerNorms).

Cross-frame attention applies to the *self*-attention (attn1): the
reference's processor stores attn1's (already-LayerNormed) input and
substitutes it as the K/V source on LOAD (cross_frame_attn.py:66-125,
3D branch). Here that is the explicit ``kv_override`` input, and the
normed hidden states are returned for collection."""

import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import sdpa


class CrossAttention(nn.Module):
    """diffusers Attention for transformer blocks: linear q/k/v without
    bias, out projection with bias; multi-head SDPA."""
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, context2=None, alpha=None):
        C = self.num_heads * self.head_dim
        to_q = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_q")
        to_k = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_k")
        to_v = nn.Dense(C, use_bias=False, dtype=self.dtype, name="to_v")
        to_out = nn.Dense(x.shape[-1], dtype=self.dtype, name="to_out_0")

        q = to_q(x)

        def attend(ctx):
            k = to_k(ctx)
            v = to_v(ctx)
            # broadcast a smaller reference batch AFTER projection (the
            # Dense is per-sample, so it commutes with the repeat)
            if k.shape[0] < x.shape[0]:
                reps = x.shape[0] // k.shape[0]
                k = jnp.repeat(k, reps, axis=0)
                v = jnp.repeat(v, reps, axis=0)

            def split(t):
                return t.reshape(t.shape[0], t.shape[1], self.num_heads,
                                 self.head_dim).transpose(0, 2, 1, 3)

            qh, kh, vh = split(q), split(k), split(v)
            out = sdpa(qh, kh, vh)
            out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1],
                                                    C)
            return to_out(out)

        if context is None:
            return attend(x)
        if context2 is None:
            return attend(context)
        # same alpha contract as layers.Attention: default 0.5, per-frame
        # (N,) alphas broadcast over tokens/channels — never the raw `(1 -
        # alpha) * out` (a (N,) alpha would broadcast against channels)
        a = (jnp.asarray(alpha, jnp.float32)
             if alpha is not None else jnp.float32(0.5))
        o0, o1 = attend(context), attend(context2)
        a = a.reshape(a.shape + (1,) * (o0.ndim - a.ndim))
        return (1 - a) * o0 + a * o1


class FeedForward(nn.Module):
    """GEGLU MLP (diffusers FeedForward: net.0 = GEGLU proj, net.2 =
    output linear)."""
    dim_out: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = self.dim_out * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="net_0_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        # diffusers GEGLU uses exact (erf) gelu, not the tanh approximation
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim_out, dtype=self.dtype, name="net_2")(h)


class BasicTransformerBlock(nn.Module):
    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, kv_override=None,
                 kv_override2=None, alpha=None):
        C = x.shape[-1]
        # torch nn.LayerNorm (diffusers BasicTransformerBlock) eps is 1e-5
        normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        stored = normed  # the CFA cache entry (3D pre-attention map)
        attn_out = CrossAttention(self.num_heads, self.head_dim,
                                  dtype=self.dtype, name="attn1")(
            normed, kv_override, kv_override2, alpha)
        x = x + attn_out
        normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, self.head_dim,
                               dtype=self.dtype, name="attn2")(
            normed, encoder_hidden_states)
        normed = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        x = x + FeedForward(C, dtype=self.dtype, name="ff")(normed)
        return x, stored


class Transformer2DModel(nn.Module):
    """SD 1.5 flavor: group-norm -> 1x1 conv proj_in -> transformer blocks
    -> 1x1 conv proj_out -> residual."""
    num_heads: int
    head_dim: int
    depth: int = 1
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, encoder_hidden_states, kv: "KVHelper"):
        N, H, W, C = x.shape
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(N, H * W, C)
        for i in range(self.depth):
            kv1, kv2 = kv.take()
            h, stored = BasicTransformerBlock(
                self.num_heads, self.head_dim, dtype=self.dtype,
                name=f"transformer_blocks_{i}")(
                h, encoder_hidden_states, kv1, kv2, kv.alpha)
            kv.push(stored)
        h = h.reshape(N, H, W, C)
        h = nn.Conv(C, (1, 1), dtype=self.dtype, name="proj_out")(h)
        return h + residual
