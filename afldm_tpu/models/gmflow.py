"""GMFlow (Xu et al., CVPR 2022) — Flax port of the optical-flow estimator
the reference uses for image interpolation
(ref image_interpolation_pipeline.py:178-191: GMFlow(feature_channels=128,
num_scales=1, upsample_factor=8, num_head=1, attention_type='swin',
ffn_dim_expansion=4, num_transformer_layers=6), checkpoint
gmflow_sintel-0c07dcb3.pth; called via shift_utils/flow_utils.py:181-193
predict_flow with attn_splits=[2], corr_radius=[-1], prop_radius=[-1],
pred_bidir_flow=True).

The gmflow submodule is not vendored in the reference checkout, so this is
an independent implementation of the published architecture (paper:
arXiv 2111.13680; official repo github.com/haofeixu/gmflow):

- CNN backbone: 7x7 stride-2 conv + InstanceNorm + ReLU, three stages of
  two residual blocks (64 -> 96 -> 128, strides 1/2/2), 1x1 output conv —
  features at 1/8 resolution.
- Sine positional encoding added to both feature maps (window-partitioned
  when attn_splits > 1).
- 6 transformer blocks, each = self-attention + cross-attention(+FFN)
  layers, run on the bidirectional concatenation (both images in one
  batch); swin mode partitions into attn_splits x attn_splits windows with
  alternating half-window shifts.
- Global correlation softmax matching: flow = softmax(F0 F1^T / sqrt(c))
  @ grid - grid (dense argmax-free matching; bidirectional by batching the
  transposed correlation).
- Self-attention flow propagation (feature-similarity weighted flow
  smoothing, global when prop_radius=-1).
- RAFT-style convex upsampling (learned 9-tap masks) from 1/8 to full
  resolution.

Layout here is NHWC; module names mirror the official torch state dict
(backbone.layer1.0.conv1 / transformer.layers.0.self_attn.q_proj /
feature_flow_attn.q_proj / upsampler.0 ...) so
``models.convert.torch_to_flax`` maps the published checkpoint onto the
param tree; InstanceNorms are affine-free exactly as upstream
(nn.InstanceNorm2d defaults), so they carry no parameters.
"""

from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.attention import sdpa


@dataclass(frozen=True)
class GMFlowConfig:
    feature_channels: int = 128
    num_transformer_layers: int = 6
    ffn_dim_expansion: int = 4
    num_head: int = 1
    attention_type: str = "swin"
    upsample_factor: int = 8
    # inference-time (reference calls: flow_utils.py:186)
    attn_splits: int = 2
    prop_radius: int = -1  # -1 = global propagation


def _instance_norm(x, eps=1e-5):
    """nn.InstanceNorm2d with default affine=False (no parameters)."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        in_planes = x.shape[-1]
        # the 3x3 convs are bias-free upstream (bias=False) — the following
        # InstanceNorm would cancel a bias anyway, but the checkpoint key
        # surface must match exactly
        h = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    name="conv1")(x)
        h = jax.nn.relu(_instance_norm(h))
        h = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, name="conv2")(h)
        h = jax.nn.relu(_instance_norm(h))
        if self.stride != 1 or in_planes != self.planes:
            x = nn.Conv(self.planes, (1, 1),
                        strides=(self.stride, self.stride),
                        name="downsample_0")(x)
            x = _instance_norm(x)
        return jax.nn.relu(x + h)


class CNNEncoder(nn.Module):
    """backbone.* — features at 1/8 resolution (num_scales=1)."""
    output_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, name="conv1")(x)
        h = jax.nn.relu(_instance_norm(h))
        for i, (planes, stride) in enumerate(
                ((64, 1), (96, 2), (128, 2)), start=1):
            h = ResidualBlock(planes, stride, name=f"layer{i}_0")(h)
            h = ResidualBlock(planes, 1, name=f"layer{i}_1")(h)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(h)


def position_embedding_sine(h, w, num_pos_feats=64, temperature=10000):
    """DETR-style normalized sine embedding, (h, w, 2*num_pos_feats)."""
    scale = 2 * np.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32)[:, None]
         / (h + eps) * scale) * np.ones((1, w), np.float32)
    x = (np.arange(1, w + 1, dtype=np.float32)[None, :]
         / (w + eps) * scale) * np.ones((h, 1), np.float32)
    dim_t = temperature ** (
        2 * (np.arange(num_pos_feats, dtype=np.float32) // 2)
        / num_pos_feats)
    px = x[:, :, None] / dim_t
    py = y[:, :, None] / dim_t
    px = np.stack([np.sin(px[:, :, 0::2]), np.cos(px[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    py = np.stack([np.sin(py[:, :, 0::2]), np.cos(py[:, :, 1::2])],
                  axis=3).reshape(h, w, -1)
    return jnp.asarray(np.concatenate([py, px], axis=-1))


def split_windows(x, splits):
    """(N, H, W, C) -> (N*splits*splits, H/s, W/s, C)."""
    N, H, W, C = x.shape
    hs, ws = H // splits, W // splits
    x = x.reshape(N, splits, hs, splits, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hs, ws, C)


def merge_windows(x, splits, H, W):
    N = x.shape[0] // (splits * splits)
    hs, ws = H // splits, W // splits
    x = x.reshape(N, splits, splits, hs, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, -1)


def _attend(q, k, v, mask=None):
    """(N, L, C) single-head scaled dot-product attention. The unmasked
    path (global attention over full feature maps — 4096 tokens at 512px
    inputs) routes through ops.attention.sdpa and picks up the Pallas
    flash kernel where it wins; the swin-masked path needs the additive
    mask and stays on the einsum."""
    c = q.shape[-1]
    if mask is None:
        return sdpa(q, k, v)
    scores = jnp.einsum("nlc,nmc->nlm", q, k,
                        preferred_element_type=jnp.float32) / np.sqrt(c)
    scores = scores + mask
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("nlm,nmc->nlc", attn, v)


def _shift_window_mask(H, W, splits):
    """Additive attention mask for shifted windows (swin): positions from
    different pre-shift windows must not attend to each other."""
    hs, ws = H // splits, W // splits
    sh, sw = hs // 2, ws // 2
    img = np.zeros((H, W), np.float32)
    cnt = 0
    for hsl in (slice(0, -hs), slice(-hs, -sh), slice(-sh, None)):
        for wsl in (slice(0, -ws), slice(-ws, -sw), slice(-sw, None)):
            img[hsl, wsl] = cnt
            cnt += 1
    win = img.reshape(splits, hs, splits, ws).transpose(0, 2, 1, 3)
    win = win.reshape(-1, hs * ws)
    diff = win[:, None, :] - win[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


class TransformerLayer(nn.Module):
    """q/k/v/merge linears (no bias) + LayerNorm, optional 2x-width GELU
    FFN over cat(source, message) — the official TransformerLayer."""
    d_model: int
    no_ffn: bool = False
    ffn_dim_expansion: int = 4
    with_shift: bool = False

    @nn.compact
    def __call__(self, source, target, shape=None, attn_splits=1,
                 shift_mask=None):
        # q/k/v/merge are plain nn.Linear upstream (bias=True); only the
        # FFN linears are bias-free
        q = nn.Dense(self.d_model, name="q_proj")(source)
        k = nn.Dense(self.d_model, name="k_proj")(target)
        v = nn.Dense(self.d_model, name="v_proj")(target)

        if attn_splits > 1:  # swin window attention
            N, L, C = q.shape
            H, W = shape
            hs, ws = H // attn_splits, W // attn_splits

            # official gmflow rolls by -(window // 2); note -hs // 2 in
            # Python is -((hs+1)//2) for ODD hs, which would desync the
            # unroll below and the shift mask (both use hs // 2)
            sh, sw = hs // 2, ws // 2

            def to_win(t):
                t = t.reshape(N, H, W, C)
                if self.with_shift:
                    t = jnp.roll(t, shift=(-sh, -sw), axis=(1, 2))
                return split_windows(t, attn_splits).reshape(
                    -1, hs * ws, C)

            qw, kw, vw = to_win(q), to_win(k), to_win(v)
            mask = None
            if self.with_shift:
                mask = jnp.tile(shift_mask, (N, 1, 1))
            msg = _attend(qw, kw, vw, mask)
            msg = merge_windows(msg.reshape(-1, hs, ws, C), attn_splits,
                                H, W).reshape(N, L, C)
            if self.with_shift:
                msg = jnp.roll(msg.reshape(N, H, W, C),
                               shift=(sh, sw),
                               axis=(1, 2)).reshape(N, L, C)
        else:
            msg = _attend(q, k, v)

        msg = nn.Dense(self.d_model, name="merge")(msg)
        msg = nn.LayerNorm(epsilon=1e-5, name="norm1")(msg)
        if not self.no_ffn:
            h = jnp.concatenate([source, msg], axis=-1)
            h = nn.Dense(self.d_model * 2 * self.ffn_dim_expansion,
                         use_bias=False, name="mlp_0")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.d_model, use_bias=False, name="mlp_2")(h)
            msg = nn.LayerNorm(epsilon=1e-5, name="norm2")(h)
        return source + msg


class TransformerBlock(nn.Module):
    d_model: int
    ffn_dim_expansion: int
    with_shift: bool

    @nn.compact
    def __call__(self, source, target, shape, attn_splits, shift_mask):
        source = TransformerLayer(
            self.d_model, no_ffn=True,
            ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift, name="self_attn")(
            source, source, shape, attn_splits, shift_mask)
        source = TransformerLayer(
            self.d_model, ffn_dim_expansion=self.ffn_dim_expansion,
            with_shift=self.with_shift, name="cross_attn_ffn")(
            source, target, shape, attn_splits, shift_mask)
        return source


class FeatureTransformer(nn.Module):
    """transformer.* — runs on the bidirectional batch [f0;f1] vs [f1;f0],
    swapping target halves after every block (the official trick)."""
    d_model: int
    num_layers: int
    ffn_dim_expansion: int
    attention_type: str

    @nn.compact
    def __call__(self, f0, f1, attn_splits):
        N, H, W, c = f0.shape
        src = jnp.concatenate([f0, f1], axis=0).reshape(2 * N, H * W, c)
        tgt = jnp.concatenate([f1, f0], axis=0).reshape(2 * N, H * W, c)
        shift_mask = (_shift_window_mask(H, W, attn_splits)
                      if (self.attention_type == "swin" and attn_splits > 1)
                      else None)
        for i in range(self.num_layers):
            with_shift = (self.attention_type == "swin" and attn_splits > 1
                          and i % 2 == 1)
            src = TransformerBlock(
                self.d_model, self.ffn_dim_expansion, with_shift,
                name=f"layers_{i}")(src, tgt, (H, W), attn_splits,
                                    shift_mask)
            tgt = jnp.concatenate([src[N:], src[:N]], axis=0)
        return (src.reshape(2 * N, H, W, c), tgt.reshape(2 * N, H, W, c))


def global_correlation_softmax(feature0, feature1):
    """flow = softmax(F0 F1^T / sqrt(c)) @ grid - grid; (N, H, W, 2) in the
    OFFICIAL (dx, dy) channel order (kept internally so the upsampler conv
    weights convert 1:1; swapped to (di, dj) at the model boundary)."""
    N, H, W, C = feature0.shape
    f0 = feature0.reshape(N, H * W, C)
    f1 = feature1.reshape(N, H * W, C)
    corr = jnp.einsum("nlc,nmc->nlm", f0, f1,
                      preferred_element_type=jnp.float32) / np.sqrt(C)
    prob = jax.nn.softmax(corr, axis=-1)
    gi = jnp.tile(jnp.arange(H, dtype=jnp.float32)[:, None],
                  (1, W)).reshape(-1)
    gj = jnp.tile(jnp.arange(W, dtype=jnp.float32)[None, :],
                  (H, 1)).reshape(-1)
    grid = jnp.stack([gj, gi], axis=-1)  # (HW, 2) as (x, y)
    corresp = jnp.einsum("nlm,md->nld", prob, grid)
    flow = corresp - grid[None]
    return flow.reshape(N, H, W, 2)


class SelfAttnPropagation(nn.Module):
    """feature_flow_attn.* — flow smoothing by feature self-similarity."""
    in_channels: int

    @nn.compact
    def __call__(self, feature0, flow):
        N, H, W, C = feature0.shape
        f = feature0.reshape(N, H * W, C)
        q = nn.Dense(self.in_channels, name="q_proj")(f)
        # upstream quirk kept verbatim: k_proj is applied to the ALREADY
        # q-projected features ("key = self.k_proj(query)" — the author's
        # comment says it was left unfixed to avoid retraining), so the
        # published checkpoint's k_proj weights expect q-space inputs
        k = nn.Dense(self.in_channels, name="k_proj")(q)
        scores = jnp.einsum("nlc,nmc->nlm", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(C)
        prob = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("nlm,nmd->nld", prob,
                         flow.reshape(N, H * W, 2))
        return out.reshape(N, H, W, 2)


# official normalize_img constants (ImageNet, applied to img/255)
_IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


class GMFlow(nn.Module):
    """Returns full-resolution bidirectional (or forward-only) flow in
    NHWC (di, dj). Input images: (N, H, W, 3) in [0, 255]; normalized
    internally with the official normalize_img (ImageNet mean/std on
    img/255) before the backbone. Use make_gmflow_flow_fn for [-1, 1]
    pipeline images."""
    config: GMFlowConfig = GMFlowConfig()

    @nn.compact
    def __call__(self, img0, img1, pred_bidir_flow: bool = True):
        cfg = self.config
        c = cfg.feature_channels
        up = cfg.upsample_factor

        backbone = CNNEncoder(c, name="backbone")
        # batch the two images through the backbone together
        imgs = jnp.concatenate([img0, img1], axis=0)
        imgs = (imgs / 255.0 - jnp.asarray(_IMG_MEAN)) / jnp.asarray(_IMG_STD)
        feats = backbone(imgs)
        f0, f1 = jnp.split(feats, 2, axis=0)
        N, H, W, _ = f0.shape

        # positional encoding (window-partitioned when attn_splits > 1,
        # matching the official feature_add_position)
        splits = cfg.attn_splits
        if splits > 1:
            pos = position_embedding_sine(H // splits, W // splits, c // 2)
            f0 = merge_windows(split_windows(f0, splits) + pos, splits, H, W)
            f1 = merge_windows(split_windows(f1, splits) + pos, splits, H, W)
        else:
            pos = position_embedding_sine(H, W, c // 2)
            f0, f1 = f0 + pos, f1 + pos

        src, tgt = FeatureTransformer(
            c, cfg.num_transformer_layers, cfg.ffn_dim_expansion,
            cfg.attention_type, name="transformer")(f0, f1, splits)

        if pred_bidir_flow:
            # correlate both directions at once: [f0;f1] against [f1;f0]
            f0t, f1t = src, tgt
        else:
            f0t, f1t = src[:N], src[N:]

        flow = global_correlation_softmax(f0t, f1t)  # (dx, dy)
        flow = SelfAttnPropagation(c, name="feature_flow_attn")(f0t, flow)

        # RAFT-style convex upsampling: masks from cat(flow, feature)
        # (official upsample_flow input order)
        inp = jnp.concatenate([flow, f0t], axis=-1)
        m = nn.Conv(256, (3, 3), padding=((1, 1), (1, 1)),
                    name="upsampler_0")(inp)
        m = jax.nn.relu(m)
        m = nn.Conv(up * up * 9, (1, 1), name="upsampler_2")(m)
        flow_hi = convex_upsample(flow * up, m, up)
        return flow_hi[..., ::-1]  # (dx, dy) -> (di, dj)


def convex_upsample(flow, mask, up):
    """RAFT convex combination upsampling; flow (N,H,W,2), mask
    (N,H,W,9*up*up) in the OFFICIAL channel layout: tap-major, i.e.
    channel = tap*up*up + ki*up + kj (gmflow upsample_flow does
    mask.view(b,1,9,K,K,h,w) and softmaxes over the 9 taps), so the
    published checkpoint's upsampler.2 output channels map 1:1."""
    N, H, W, _ = flow.shape
    mask = mask.reshape(N, H, W, 9, up * up)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhoods of the coarse flow (zero-padded)
    pads = jnp.pad(flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    taps = []
    for di in range(3):
        for dj in range(3):
            taps.append(pads[:, di:di + H, dj:dj + W, :])
    taps = jnp.stack(taps, axis=3)  # (N, H, W, 9, 2)

    out = jnp.einsum("nhwkp,nhwkd->nhwpd", mask, taps)  # (N,H,W,up*up,2)
    out = out.reshape(N, H, W, up, up, 2)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(N, H * up, W * up, 2)
    return out


def load_gmflow_checkpoint(path, params):
    """Map the official gmflow_sintel checkpoint onto the Flax tree via the
    structural converter. The torch file stores {'model': state_dict}."""
    import torch as _torch
    from .convert import torch_to_flax
    ckpt = _torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items()}
    return torch_to_flax(sd, params)


def make_gmflow_flow_fn(params, config: Optional[GMFlowConfig] = None,
                        image_range=(-1.0, 1.0)):
    """Returns flows = fn(img0, img1) -> (fwd, fwd_occ, bwd, bwd_occ) in the
    pipeline convention (NHWC images in [-1, 1]; flow (di, dj)), matching
    the reference predict_flow (flow_utils.py:181-193)."""
    from ..shift.flow import forward_backward_consistency_check

    model = GMFlow(config or GMFlowConfig())
    lo, hi = image_range
    scale = 255.0 / (hi - lo)

    @jax.jit
    def fn(img0, img1):
        a = (img0 - lo) * scale
        b = (img1 - lo) * scale
        flows = model.apply(params, a, b, pred_bidir_flow=True)
        n = img0.shape[0]
        fwd, bwd = flows[:n], flows[n:]
        fwd_occ, bwd_occ = forward_backward_consistency_check(fwd, bwd)
        return fwd, fwd_occ, bwd, bwd_occ

    return fn
