"""Weight-conversion tests: torch<->flax round trip on the UNet/VAE trees,
plus semantic checks against torch ops (conv / groupnorm / attention) so
layout transposes are provably right, not just shape-right."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import (UNet2DModel, UNet2DConfig, AutoencoderKL,
                              AutoencoderKLConfig)
from afldm_tpu.models.convert import torch_to_flax, flax_to_torch

torch = pytest.importorskip("torch")


TINY_UNET = UNet2DConfig(
    sample_size=8, down_block_types=("AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D"),
    block_out_channels=(16, 32), layers_per_block=1,
    attention_head_dim=8, norm_num_groups=8)


def test_unet_roundtrip(rng):
    model = UNet2DModel(TINY_UNET)
    x = jnp.zeros((1, 8, 8, 4))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0]))
    sd = flax_to_torch(params)
    # diffusers-style key names come out
    assert "conv_in.weight" in sd
    assert "down_blocks.0.resnets.0.conv1.weight" in sd
    assert "down_blocks.0.attentions.0.to_out.0.weight" in sd
    assert "time_embedding.linear_1.weight" in sd
    assert sd["conv_in.weight"].shape[0] == 16  # OIHW

    # perturb and convert back
    sd2 = {k: v + 1.0 for k, v in sd.items()}
    new_params, report = torch_to_flax(sd2, params)
    assert not report["unmatched_torch_keys"], report["unmatched_torch_keys"][:5]
    assert not report["unfilled_flax_leaves"], report["unfilled_flax_leaves"][:5]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a) + 1.0, np.asarray(b),
                                   rtol=1e-6)


def test_vae_roundtrip():
    cfg = AutoencoderKLConfig(block_out_channels=(8, 8), layers_per_block=1,
                              norm_num_groups=4, sample_size=16)
    model = AutoencoderKL(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    sd = flax_to_torch(params)
    assert "encoder.conv_in.weight" in sd
    assert "encoder.down_blocks.0.resnets.0.norm1.weight" in sd
    assert "decoder.mid_block.attentions.0.to_q.weight" in sd
    assert "quant_conv.weight" in sd
    new_params, report = torch_to_flax(sd, params)
    assert not report["unmatched_torch_keys"]
    assert not report["unfilled_flax_leaves"]


def test_conv_semantics_match_torch(rng):
    """HWIO conversion of an OIHW torch conv must reproduce torch's output
    (NCHW vs NHWC)."""
    tconv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tconv(torch.from_numpy(x)).numpy()

    import flax.linen as nn
    conv = nn.Conv(5, (3, 3), padding=((1, 1), (1, 1)))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = conv.init(jax.random.PRNGKey(0), xj)
    sd = {"weight": tconv.weight.detach().numpy(),
          "bias": tconv.bias.detach().numpy()}
    params, rep = torch_to_flax(sd, params)
    assert rep["n_converted"] == 2
    got = np.asarray(conv.apply(params, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_groupnorm_semantics_match_torch(rng):
    tnorm = torch.nn.GroupNorm(4, 8, eps=1e-6)
    with torch.no_grad():
        tnorm.weight.copy_(torch.rand(8))
        tnorm.bias.copy_(torch.rand(8))
    x = rng.standard_normal((2, 8, 6, 6)).astype(np.float32)
    with torch.no_grad():
        want = tnorm(torch.from_numpy(x)).numpy()

    import flax.linen as nn
    norm = nn.GroupNorm(num_groups=4, epsilon=1e-6)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    params = norm.init(jax.random.PRNGKey(0), xj)
    params, _ = torch_to_flax({"weight": tnorm.weight.detach().numpy(),
                               "bias": tnorm.bias.detach().numpy()}, params)
    got = np.asarray(norm.apply(params, xj)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_attention_semantics_match_torch(rng):
    """Our Attention (group_norm -> qkv -> SDPA -> to_out + residual) against
    a literal torch transcription of the diffusers deprecated attention
    block."""
    C, heads = 16, 2
    from afldm_tpu.models import Attention
    attn = Attention(num_heads=heads, eps=1e-6, groups=4)
    x = rng.standard_normal((1, 4, 4, C)).astype(np.float32)
    xj = jnp.asarray(x)
    params = attn.init(jax.random.PRNGKey(0), xj)
    sd = flax_to_torch(params)

    # torch transcription
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    gn = torch.nn.GroupNorm(4, C, eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(sd["group_norm.weight"]))
        gn.bias.copy_(torch.from_numpy(sd["group_norm.bias"]))
    q_w = torch.from_numpy(sd["to_q.weight"])
    k_w = torch.from_numpy(sd["to_k.weight"])
    v_w = torch.from_numpy(sd["to_v.weight"])
    o_w = torch.from_numpy(sd["to_out.0.weight"])
    q_b = torch.from_numpy(sd["to_q.bias"])
    k_b = torch.from_numpy(sd["to_k.bias"])
    v_b = torch.from_numpy(sd["to_v.bias"])
    o_b = torch.from_numpy(sd["to_out.0.bias"])

    with torch.no_grad():
        res = xt
        h = gn(xt).flatten(2).transpose(1, 2)  # (1, HW, C)
        q = h @ q_w.T + q_b
        k = h @ k_w.T + k_b
        v = h @ v_w.T + v_b

        def split(t):
            return t.reshape(1, -1, heads, C // heads).transpose(1, 2)

        o = torch.nn.functional.scaled_dot_product_attention(
            split(q), split(k), split(v))
        o = o.transpose(1, 2).reshape(1, -1, C) @ o_w.T + o_b
        want = (o.transpose(1, 2).reshape(1, C, 4, 4) + res).numpy()

    got, _ = attn.apply(params, xj)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)


def test_resnet_block_semantics_match_torch(rng):
    """Full ResnetBlock2D (norm-act-conv, temb injection, norm-act-conv,
    shortcut) against a literal torch transcription of the diffusers
    module."""
    from afldm_tpu.models import ResnetBlock2D
    C_in, C_out, T = 8, 12, 16
    block = ResnetBlock2D(out_channels=C_out, eps=1e-5, groups=4,
                          act_fn="silu")
    x = rng.standard_normal((2, 6, 6, C_in)).astype(np.float32)
    temb = rng.standard_normal((2, T)).astype(np.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(temb))
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch(params).items()}

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tt = torch.from_numpy(temb)

    def gn(name, ch, h):
        m = torch.nn.GroupNorm(4, ch, eps=1e-5)
        with torch.no_grad():
            m.weight.copy_(sd[f"{name}.weight"])
            m.bias.copy_(sd[f"{name}.bias"])
        return m(h)

    def conv(name, h, k=3, pad=1):
        w = sd[f"{name}.weight"]
        b = sd[f"{name}.bias"]
        return torch.nn.functional.conv2d(h, w, b, padding=pad)

    with torch.no_grad():
        h = gn("norm1", C_in, xt)
        h = torch.nn.functional.silu(h)
        h = conv("conv1", h)
        t = torch.nn.functional.silu(tt) @ sd["time_emb_proj.weight"].T \
            + sd["time_emb_proj.bias"]
        h = h + t[:, :, None, None]
        h = gn("norm2", C_out, h)
        h = torch.nn.functional.silu(h)
        h = conv("conv2", h)
        sc = torch.nn.functional.conv2d(xt, sd["conv_shortcut.weight"],
                                        sd["conv_shortcut.bias"])
        want = (sc + h).numpy()

    got = block.apply(params, jnp.asarray(x), jnp.asarray(temb))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=2e-5)
