"""SD-family conversion coverage (VERDICT round 1, item 3): round-trip the
UNet2DConditionModel / ControlNetModel / CLIP trees through the diffusers
key mapping, and cross-check full forwards against independent torch
transcriptions (incl. the alias-free VAE, whose AF ops are driven by the
REFERENCE's own torch ideal_lpf modules)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import AutoencoderKL, AutoencoderKLConfig
from afldm_tpu.models.unet2d_condition import (UNet2DConditionModel,
                                               UNet2DConditionConfig)
from afldm_tpu.models.controlnet import ControlNetModel, ControlNetConfig
from afldm_tpu.models.convert import torch_to_flax, flax_to_torch

from tests._reference import reference_available, import_reference

torch = pytest.importorskip("torch")
REF = import_reference() if reference_available() else None

TINY_COND = UNet2DConditionConfig(
    sample_size=8, in_channels=4, out_channels=4,
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    block_out_channels=(16, 32), layers_per_block=1,
    attention_head_dim=2, cross_attention_dim=8, norm_num_groups=8)


def _init_cond_unet(alias_free=False):
    cfg = TINY_COND if not alias_free else UNet2DConditionConfig(
        **{**TINY_COND.to_dict(), "alias_free": True})
    model = UNet2DConditionModel(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, 5, 8))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0]), ehs)
    return model, params


def test_unet_condition_roundtrip():
    model, params = _init_cond_unet()
    sd = flax_to_torch(params)
    # diffusers SD-1.5 key surface
    for key in [
        "conv_in.weight",
        "time_embedding.linear_1.weight",
        "down_blocks.0.resnets.0.conv1.weight",
        "down_blocks.0.attentions.0.proj_in.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_k.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.2.weight",
        "down_blocks.0.attentions.0.transformer_blocks.0.norm1.weight",
        "down_blocks.0.downsamplers.0.conv.weight",
        "mid_block.resnets.0.time_emb_proj.weight",
        "mid_block.attentions.0.transformer_blocks.0.attn1.to_out.0.weight",
        "up_blocks.1.attentions.0.proj_out.weight",
        "up_blocks.0.upsamplers.0.conv.weight",
        "conv_norm_out.weight",
        "conv_out.bias",
    ]:
        assert key in sd, key

    sd2 = {k: v + 1.0 for k, v in sd.items()}
    new_params, report = torch_to_flax(sd2, params)
    assert not report["unmatched_torch_keys"], \
        report["unmatched_torch_keys"][:5]
    assert not report["unfilled_flax_leaves"], \
        report["unfilled_flax_leaves"][:5]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a) + 1.0, np.asarray(b),
                                   rtol=1e-6)


def test_unet_condition_af_same_tree():
    """The alias-free wiring must expose the identical parameter tree
    (one checkpoint serves both wirings, af_blocks.py:128-129)."""
    _, p_naive = _init_cond_unet(alias_free=False)
    _, p_af = _init_cond_unet(alias_free=True)
    flat_n = jax.tree_util.tree_structure(p_naive)
    flat_a = jax.tree_util.tree_structure(p_af)
    assert flat_n == flat_a
    for a, b in zip(jax.tree_util.tree_leaves(p_naive),
                    jax.tree_util.tree_leaves(p_af)):
        assert np.asarray(a).shape == np.asarray(b).shape


def test_controlnet_roundtrip():
    cfg = ControlNetConfig(
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        block_out_channels=(16, 32), layers_per_block=1,
        attention_head_dim=2, cross_attention_dim=8, norm_num_groups=8)
    model = ControlNetModel(cfg)
    x = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, 5, 8))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray([0]), ehs, x)
    sd = flax_to_torch(params)
    for key in ["conv_in.weight", "conv_in2.weight",
                "controlnet_down_blocks.0.weight",
                "controlnet_mid_block.weight",
                "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_v.weight"]:
        assert key in sd, key
    sd2 = {k: v + 0.5 for k, v in sd.items()}
    new_params, report = torch_to_flax(sd2, params)
    assert not report["unmatched_torch_keys"], \
        report["unmatched_torch_keys"][:5]
    assert not report["unfilled_flax_leaves"], \
        report["unfilled_flax_leaves"][:5]


def test_clip_text_torch_to_flax(tmp_path):
    """A torch CLIPTextModel checkpoint saved locally must load through
    TextEncoder (from_pt fallback) and match the torch forward — the tree
    the SD acceptance configs need (sd_text_trainer.py:110-115)."""
    from transformers import CLIPTextConfig, CLIPTextModel
    cfg = CLIPTextConfig(
        vocab_size=99, hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=12, projection_dim=16)
    tm = CLIPTextModel(cfg)
    tm.eval()
    tm.save_pretrained(tmp_path)  # saves torch weights only

    ids = np.array([[49, 3, 7, 1] + [2] * 8], np.int32) % 99
    with torch.no_grad():
        want = tm(input_ids=torch.from_numpy(ids.astype(np.int64)))
        want = want.last_hidden_state.numpy()

    from afldm_tpu.models.text_encoder import TextEncoder
    te = TextEncoder(pretrained_dir=str(tmp_path))
    got = np.asarray(te.encode(ids))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_clip_real_tokenizer_branch(tmp_path):
    """The REAL CLIPTokenizer branch (text_encoder.py tokenize), exercised
    with a locally synthesized vocab.json/merges.txt — no downloads
    (VERDICT r2 weak #4: the hash fallback maps prompts to arbitrary ids,
    so nothing tested prompt semantics until now)."""
    import json
    from transformers import CLIPTextConfig, CLIPTextModel

    # minimal BPE vocab: single chars, word-final variants, and the merge
    # chain for 'hello'/'world' so known prompts tokenize to single tokens
    toks = ["<|startoftext|>", "<|endoftext|>"]
    toks += [c for c in "abcdefghijklmnopqrstuvwxyz"]
    toks += [c + "</w>" for c in "abcdefghijklmnopqrstuvwxyz"]
    # CLIP's BPE appends </w> to a word's LAST char before merging, so the
    # final merge of each chain pairs with the word-final variant
    merges = [("h", "e"), ("he", "l"), ("hel", "l"), ("hell", "o</w>"),
              ("w", "o"), ("wo", "r"), ("wor", "l"), ("worl", "d</w>")]
    for a, b in merges:
        toks.append(a + b)
    vocab = {t: i for i, t in enumerate(toks)}
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges))

    cfg = CLIPTextConfig(
        vocab_size=len(vocab), hidden_size=16, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=12, projection_dim=16,
        bos_token_id=vocab["<|startoftext|>"],
        eos_token_id=vocab["<|endoftext|>"])
    CLIPTextModel(cfg).save_pretrained(tmp_path)

    from afldm_tpu.models.text_encoder import TextEncoder
    te = TextEncoder(pretrained_dir=str(tmp_path))
    assert te._tokenizer is not None, "real tokenizer branch not taken"

    ids = te.tokenize(["hello world", "world hello hello"])
    bos, eos = vocab["<|startoftext|>"], vocab["<|endoftext|>"]
    hello, world = vocab["hello</w>"], vocab["world</w>"]
    assert ids.shape == (2, 12)
    assert list(ids[0][:4]) == [bos, hello, world, eos]
    assert list(ids[1][:5]) == [bos, world, hello, hello, eos]
    # decode round-trip through the same tokenizer
    assert te._tokenizer.decode(ids[0], skip_special_tokens=True
                                ).strip() == "hello world"
    # encode must consume the real ids end-to-end
    out = np.asarray(te.encode(["hello world"]))
    assert out.shape == (1, 12, 16) and np.isfinite(out).all()


# ---------------------------------------------------------------------------
# Torch transcription helpers: run our converted state dict through an
# independent torch implementation of the same architecture (diffusers
# semantics; AF ops via the reference's own torch ideal_lpf modules).
# ---------------------------------------------------------------------------

class TorchRunner:
    def __init__(self, sd):
        self.sd = {k: torch.from_numpy(np.ascontiguousarray(v))
                   for k, v in sd.items()}

    def conv(self, name, x, stride=1, pad=1):
        return torch.nn.functional.conv2d(
            x, self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
            stride=stride, padding=pad)

    def gn(self, name, x, groups, eps):
        return torch.nn.functional.group_norm(
            x, groups, self.sd[f"{name}.weight"], self.sd[f"{name}.bias"],
            eps)

    def ln(self, name, x, eps=1e-5):
        return torch.nn.functional.layer_norm(
            x, (x.shape[-1],), self.sd[f"{name}.weight"],
            self.sd[f"{name}.bias"], eps)

    def dense(self, name, x, bias=True):
        w = self.sd[f"{name}.weight"]
        b = self.sd[f"{name}.bias"] if bias else None
        return torch.nn.functional.linear(x, w, b)

    def act(self, x, filtered):
        if filtered and x.ndim >= 4:
            hi = REF.ideal_lpf.UpsampleRFFT(up=2)(x)
            hi = torch.nn.functional.silu(hi)
            return REF.ideal_lpf.LPF_RFFT(cutoff=0.5)(hi)[:, :, ::2, ::2]
        return torch.nn.functional.silu(x)

    def resnet(self, p, x, temb=None, filtered=False, groups=8, eps=1e-6):
        h = self.gn(f"{p}.norm1", x, groups, eps)
        h = self.act(h, filtered)
        h = self.conv(f"{p}.conv1", h)
        if temb is not None:
            t = self.dense(f"{p}.time_emb_proj",
                           torch.nn.functional.silu(temb))
            h = h + t[:, :, None, None]
        h = self.gn(f"{p}.norm2", h, groups, eps)
        h = self.act(h, filtered)
        h = self.conv(f"{p}.conv2", h)
        if f"{p}.conv_shortcut.weight" in self.sd:
            x = self.conv(f"{p}.conv_shortcut", x, pad=0)
        return x + h

    def spatial_attention(self, p, x, groups, eps=1e-6):
        """diffusers deprecated attention block (VAE mid), single head."""
        N, C, H, W = x.shape
        res = x
        h = self.gn(f"{p}.group_norm", x, groups, eps)
        h = h.flatten(2).transpose(1, 2)
        q = self.dense(f"{p}.to_q", h)
        k = self.dense(f"{p}.to_k", h)
        v = self.dense(f"{p}.to_v", h)
        o = torch.nn.functional.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.dense(f"{p}.to_out.0", o)
        return o.transpose(1, 2).reshape(N, C, H, W) + res

    def mha(self, q, k, v, heads):
        def split(t):
            return t.reshape(t.shape[0], t.shape[1], heads,
                             t.shape[2] // heads).transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(
            split(q), split(k), split(v))
        return o.transpose(1, 2).reshape(q.shape)

    def transformer2d(self, p, x, ehs, heads, groups):
        """SD-1.5 Transformer2DModel: GN -> 1x1 conv in -> basic block
        (self-attn, cross-attn, GEGLU FF) -> 1x1 conv out + residual."""
        N, C, H, W = x.shape
        res = x
        h = self.gn(f"{p}.norm", x, groups, 1e-6)
        h = self.conv(f"{p}.proj_in", h, pad=0)
        h = h.flatten(2).transpose(1, 2)
        b = f"{p}.transformer_blocks.0"
        n = self.ln(f"{b}.norm1", h)
        h = h + self.dense(
            f"{b}.attn1.to_out.0",
            self.mha(self.dense(f"{b}.attn1.to_q", n, bias=False),
                     self.dense(f"{b}.attn1.to_k", n, bias=False),
                     self.dense(f"{b}.attn1.to_v", n, bias=False), heads))
        n = self.ln(f"{b}.norm2", h)
        h = h + self.dense(
            f"{b}.attn2.to_out.0",
            self.mha(self.dense(f"{b}.attn2.to_q", n, bias=False),
                     self.dense(f"{b}.attn2.to_k", ehs, bias=False),
                     self.dense(f"{b}.attn2.to_v", ehs, bias=False), heads))
        n = self.ln(f"{b}.norm3", h)
        ff = self.dense(f"{b}.ff.net.0.proj", n)
        a, gate = ff.chunk(2, dim=-1)
        ff = a * torch.nn.functional.gelu(gate)
        h = h + self.dense(f"{b}.ff.net.2", ff)
        h = h.transpose(1, 2).reshape(N, C, H, W)
        return self.conv(f"{p}.proj_out", h, pad=0) + res

    def downsample(self, p, x, alias_free, vae=False):
        if alias_free:
            h = self.conv(f"{p}.conv", x, stride=1, pad=1)
            return REF.ideal_lpf.LPF_RFFT(cutoff=0.5)(h)[:, :, ::2, ::2]
        if vae:  # diffusers VAE downsampler uses asymmetric (0,1) padding
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))
            return self.conv(f"{p}.conv", x, stride=2, pad=0)
        return self.conv(f"{p}.conv", x, stride=2, pad=1)

    def upsample(self, p, x, alias_free):
        if alias_free:
            x = REF.ideal_lpf.UpsampleRFFT(up=2)(x)
        else:
            x = torch.nn.functional.interpolate(x, scale_factor=2,
                                                mode="nearest")
        return self.conv(f"{p}.conv", x, pad=1)


def _timestep_embedding(t, dim):
    """flip_sin_to_cos=True, downscale_freq_shift=0 (FFHQ/SD convention)."""
    half = dim // 2
    freqs = np.exp(-np.log(10000) * np.arange(half, dtype=np.float64) / half)
    ang = np.asarray(t, np.float64)[:, None] * freqs[None, :]
    emb = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
    return torch.from_numpy(emb.astype(np.float32))


@pytest.mark.skipif(REF is None, reason="reference not available")
@pytest.mark.parametrize("alias_free", [False, True])
def test_af_vae_forward_matches_torch(rng, alias_free):
    """Tiny AF-VAE full encode+decode vs the torch transcription (AF ops
    from the reference's ideal_lpf)."""
    cfg = AutoencoderKLConfig(
        block_out_channels=(8, 8), layers_per_block=1, norm_num_groups=4,
        latent_channels=4, sample_size=16, alias_free=alias_free,
        mid_act=True, down_filtered_act=(True, True),
        up_filtered_act=(True, True), up_rescale=(True,))
    model = AutoencoderKL(cfg)
    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got_dec, got_mean, _ = model.apply(params, jnp.asarray(x))

    r = TorchRunner(flax_to_torch(params))
    af = alias_free
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    G, EPS = 4, 1e-6
    with torch.no_grad():
        # ---- encoder: filtered = alias_free & down_filtered_act[i];
        # downsampler AF when reversed(up_rescale)[i]
        h = r.conv("encoder.conv_in", xt)
        h = r.resnet("encoder.down_blocks.0.resnets.0", h, filtered=af,
                     groups=G)
        h = r.downsample("encoder.down_blocks.0.downsamplers.0", h,
                         alias_free=af, vae=True)
        h = r.resnet("encoder.down_blocks.1.resnets.0", h, filtered=af,
                     groups=G)
        h = r.resnet("encoder.mid_block.resnets.0", h, filtered=af, groups=G)
        h = r.spatial_attention("encoder.mid_block.attentions.0", h, G)
        h = r.resnet("encoder.mid_block.resnets.1", h, filtered=af, groups=G)
        h = r.gn("encoder.conv_norm_out", h, G, EPS)
        h = torch.nn.functional.silu(h)
        h = r.conv("encoder.conv_out", h)
        h = r.conv("quant_conv", h, pad=0)
        mean = h[:, :4]

        # ---- decoder (mode latent): filtered = up_filtered_act[i];
        # upsampler AF when up_rescale[i]
        z = r.conv("post_quant_conv", mean, pad=0)
        h = r.conv("decoder.conv_in", z)
        h = r.resnet("decoder.mid_block.resnets.0", h, filtered=af, groups=G)
        h = r.spatial_attention("decoder.mid_block.attentions.0", h, G)
        h = r.resnet("decoder.mid_block.resnets.1", h, filtered=af, groups=G)
        h = r.resnet("decoder.up_blocks.0.resnets.0", h, filtered=af,
                     groups=G)
        h = r.resnet("decoder.up_blocks.0.resnets.1", h, filtered=af,
                     groups=G)
        h = r.upsample("decoder.up_blocks.0.upsamplers.0", h, alias_free=af)
        h = r.resnet("decoder.up_blocks.1.resnets.0", h, filtered=af,
                     groups=G)
        h = r.resnet("decoder.up_blocks.1.resnets.1", h, filtered=af,
                     groups=G)
        h = r.gn("decoder.conv_norm_out", h, G, EPS)
        h = torch.nn.functional.silu(h)
        want_dec = r.conv("decoder.conv_out", h).numpy()
        want_mean = mean.numpy()

    np.testing.assert_allclose(
        np.asarray(got_mean).transpose(0, 3, 1, 2), want_mean, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got_dec).transpose(0, 3, 1, 2), want_dec, atol=1e-4)


@pytest.mark.skipif(REF is None, reason="reference not available")
@pytest.mark.parametrize("alias_free", [False, True])
def test_cond_unet_forward_matches_torch(rng, alias_free):
    """2-block conditional UNet full forward vs the torch transcription."""
    model, params = _init_cond_unet(alias_free=alias_free)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    ehs = rng.standard_normal((1, 5, 8)).astype(np.float32)
    t = np.array([217], np.int32)
    got, _ = model.apply(params, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(ehs))

    r = TorchRunner(flax_to_torch(params))
    af = alias_free
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    et = torch.from_numpy(ehs)
    G, EPS, HEADS = 8, 1e-5, 2
    with torch.no_grad():
        temb = _timestep_embedding(t, 16)
        temb = r.dense("time_embedding.linear_1", temb)
        temb = torch.nn.functional.silu(temb)
        temb = r.dense("time_embedding.linear_2", temb)

        h = r.conv("conv_in", xt)
        skips = [h]
        # down block 0: CrossAttn (16ch), with downsampler
        h = r.resnet("down_blocks.0.resnets.0", h, temb, filtered=af,
                     groups=G, eps=EPS)
        h = r.transformer2d("down_blocks.0.attentions.0", h, et, HEADS, G)
        skips.append(h)
        h = r.downsample("down_blocks.0.downsamplers.0", h, alias_free=af)
        skips.append(h)
        # down block 1: plain final (32ch)
        h = r.resnet("down_blocks.1.resnets.0", h, temb, filtered=af,
                     groups=G, eps=EPS)
        skips.append(h)
        # mid
        h = r.resnet("mid_block.resnets.0", h, temb, filtered=af, groups=G,
                     eps=EPS)
        h = r.transformer2d("mid_block.attentions.0", h, et, HEADS, G)
        h = r.resnet("mid_block.resnets.1", h, temb, filtered=af, groups=G,
                     eps=EPS)
        # up block 0: plain (32ch) + upsampler; n_res = 2
        for i in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = r.resnet(f"up_blocks.0.resnets.{i}", h, temb, filtered=af,
                         groups=G, eps=EPS)
        h = r.upsample("up_blocks.0.upsamplers.0", h, alias_free=af)
        # up block 1: CrossAttn (16ch); n_res = 2
        for i in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = r.resnet(f"up_blocks.1.resnets.{i}", h, temb, filtered=af,
                         groups=G, eps=EPS)
            h = r.transformer2d(f"up_blocks.1.attentions.{i}", h, et,
                                HEADS, G)
        h = r.gn("conv_norm_out", h, G, EPS)
        h = torch.nn.functional.silu(h)
        want = r.conv("conv_out", h).numpy()

    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               atol=1e-4)
