"""Image interpolation via flow-warped noise + cross-frame-attention
blending (ref afldm/pipelines/image_interpolation_pipeline.py:171-766):

1. predict bidirectional optical flow + occlusion between the two stills
   (reference: GMFlow; here a pluggable ``flow_fn`` — any callable
   ``(img0, img1) -> (fwd_flow, fwd_occ, bwd_flow, bwd_occ)``; flows may
   also be passed in precomputed),
2. DDIM-invert both endpoint latents,
3. upsample the inverted noise 8x (ideal FFT or variance-preserving noise
   upsample), forward-splat it along alpha-scaled flow, fill disocclusions
   with a FIXED random background, decimate (ref :556-599),
4. run a CFA STORE denoise for both endpoints (store slots 0 and 1), then
   denoise every in-between frame with attention-output interpolation
   res = (1-a) attn(q, kv0) + a attn(q, kv1) (ref :604-715; the
   ``enable_morph``/``enable_interp`` drift of SURVEY.md §2.12 item 4 is
   fixed — interpolation is on by default).

The reference's numba CPU splats round-trip GPU->CPU inside the frame loop
(SURVEY.md §3.5); here everything is device-side scatter-adds and the
per-frame noises are built in one batch.
"""

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..shift.flow import get_intermediate_warp_mask, flow_warp, \
    collect_noise_pixel
from ..ops.ideal_lpf import upsample_rfft
from ._frames import FrameShardingMixin


def slerp(a, b, t):
    """Spherical interpolation between two noise tensors."""
    af = a.reshape(a.shape[0], -1)
    bf = b.reshape(b.shape[0], -1)
    dot = jnp.sum(af * bf, -1) / (jnp.linalg.norm(af, axis=-1)
                                  * jnp.linalg.norm(bf, axis=-1))
    omega = jnp.arccos(jnp.clip(dot, -1 + 1e-7, 1 - 1e-7))
    so = jnp.sin(omega)
    c1 = (jnp.sin((1 - t) * omega) / so).reshape(-1, 1, 1, 1)
    c2 = (jnp.sin(t * omega) / so).reshape(-1, 1, 1, 1)
    return c1 * a + c2 * b


class ImageInterpolationPipeline(FrameShardingMixin):
    def __init__(self, vae, vae_params, unet, unet_params, scheduler,
                 text_encoder=None, flow_fn: Optional[Callable] = None,
                 scaling_factor=None, mesh=None):
        self.vae = vae
        self.vae_params = vae_params
        self.unet = unet
        self.unet_params = unet_params
        self.scheduler = scheduler
        self.text_encoder = text_encoder
        self.flow_fn = flow_fn
        self.scaling_factor = (scaling_factor if scaling_factor is not None
                               else vae.config.scaling_factor)
        self.mesh = mesh
        self._fns = {}

    # _shard_frames/_vae_fn/_pad_rows/_slice_rows come from
    # FrameShardingMixin (shared with VideoEquivEditingPipeline)

    def encode(self, images):
        mean, _ = self._vae_fn("encode")(self.vae_params, images)
        return mean * self.scaling_factor

    def decode(self, latents):
        return self._vae_fn("decode")(self.vae_params,
                                      latents / self.scaling_factor)

    def _prompt(self, prompt, batch):
        if self.text_encoder is not None:
            e = self.text_encoder.encode([prompt])
        else:
            e = jnp.zeros((1, 77, self.unet.config.cross_attention_dim),
                          jnp.float32)
        return jnp.repeat(e, batch, axis=0)

    def _scan(self, mode, num_steps):
        key = (mode, num_steps)
        if key in self._fns:
            return self._fns[key]
        unet, sched = self.unet, self.scheduler
        ts = jnp.asarray(sched.set_timesteps(num_steps))
        dt = sched.num_train_timesteps // num_steps
        ts_prev = ts - dt

        if mode == "invert":
            ts_up = ts[::-1]
            ts_up_prev = jnp.concatenate([jnp.asarray([-1]), ts_up[:-1]])

            @jax.jit
            def run(params, latents, ehs):
                def body(carry, x):
                    t, pt = x
                    eps, _ = unet.apply(params, carry, t, ehs)
                    return sched.inversion_step(eps, pt, t, carry), None
                return jax.lax.scan(body, latents, (ts_up, ts_up_prev))[0]
        elif mode == "store":
            @jax.jit
            def run(params, latents, ehs):
                def body(carry, x):
                    t, pt = x
                    eps, kv = unet.apply(params, carry, t, ehs)
                    nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
                    return nxt, kv
                return jax.lax.scan(body, latents, (ts, ts_prev))
        elif mode == "interp":
            @jax.jit
            def run(params, latents, ehs, kv0, kv1, alphas):
                def body(carry, x):
                    t, pt, k0, k1 = x
                    eps, _ = unet.apply(params, carry, t, ehs, kv_in=k0,
                                        kv_in2=k1, alpha=alphas)
                    nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
                    return nxt, None
                return jax.lax.scan(body, latents, (ts, ts_prev, kv0, kv1))[0]
        else:
            raise ValueError(mode)
        self._fns[key] = run
        return run

    def warp_noise(self, key, inv0, fwd_flow, fwd_occ, alphas,
                   noise_mode: str = "ideal", noise_ratio: int = 8):
        """Build per-alpha warped noises from endpoint-0's inverted latent
        (ref :556-599). One jitted program covers every alpha."""
        alphas = tuple(float(a) for a in alphas)
        cache_key = ("warp_noise", noise_mode, noise_ratio, alphas)
        if cache_key in self._fns:
            return self._fns[cache_key](key, inv0, fwd_flow, fwd_occ)

        @jax.jit
        def build(key, inv0, fwd_flow, fwd_occ):
            k_up, k_bg, k_col = jax.random.split(key, 3)
            if noise_mode == "ideal":
                hi = upsample_rfft(inv0, up=noise_ratio)
            else:
                from ..shift.flow import upsample_noise
                hi = upsample_noise(inv0, noise_ratio, k_up)
            # fixed random background shared by every frame (ref :567-581)
            bg = jax.random.normal(k_bg, inv0.shape, inv0.dtype)
            noises = []
            for i, a in enumerate(alphas):
                bwd_flow, bwd_occ = get_intermediate_warp_mask(
                    fwd_flow, fwd_occ, a)
                warped = flow_warp(hi, bwd_flow)
                low = collect_noise_pixel(warped, bwd_occ, noise_ratio,
                                          jax.random.fold_in(k_col, i))
                occ_low = bwd_occ[:, ::noise_ratio, ::noise_ratio, :]
                noises.append(low * (1 - occ_low) + bg * occ_low)
            return jnp.concatenate(noises, axis=0)

        self._fns[cache_key] = build
        return build(key, inv0, fwd_flow, fwd_occ)

    def __call__(self, img0, img1, num_frames: int = 17,
                 num_inference_steps: int = 50, key=None, prompt="",
                 flows=None, use_slerp: bool = True,
                 noise_mode: str = "ideal", output_type: str = "np",
                 decode_chunk: int = None):
        assert key is not None
        alphas = np.linspace(0.0, 1.0, num_frames)

        if flows is None:
            if self.flow_fn is None:
                # zero flow turns the noise warping into a no-op — never do
                # that silently (VERDICT r1 weak-5; same bug class as the
                # reference's enable_morph drift, SURVEY §2.12-4)
                raise ValueError(
                    "ImageInterpolationPipeline needs optical flow: pass "
                    "flows=(fwd, fwd_occ, bwd, bwd_occ) or construct the "
                    "pipeline with a flow_fn (e.g. shift.simple_flow."
                    "lk_flow_fn or models.gmflow). To intentionally "
                    "interpolate without warping, pass zero flows "
                    "explicitly.")
            flows = self.flow_fn(img0, img1)
        # only the forward direction drives the endpoint-0 noise warp
        # (ref :556-599), but the occlusion masks are UnFlow
        # forward-backward consistency checks — producing fwd_occ already
        # required both directions, so the 4-tuple costs nothing extra
        fwd_flow, fwd_occ, bwd_flow, bwd_occ = flows

        lat0 = self.encode(img0)
        lat1 = self.encode(img1)
        ehs1 = self._prompt(prompt, 1)

        invert = self._scan("invert", num_inference_steps)
        inv0 = invert(self.unet_params, lat0, ehs1)
        inv1 = invert(self.unet_params, lat1, ehs1)

        # per-frame warped noises from endpoint 0 (+ optional slerp toward
        # endpoint 1's inversion, ref :595-597)
        noises = self.warp_noise(key, inv0, fwd_flow, fwd_occ, alphas,
                                 noise_mode=noise_mode)
        if use_slerp:
            a_col = jnp.asarray(alphas, jnp.float32)
            if "blend" not in self._fns:
                self._fns["blend"] = jax.jit(
                    lambda noises, inv1, a: slerp(
                        noises, jnp.repeat(inv1, noises.shape[0], 0), a))
            noises = self._fns["blend"](noises, inv1, a_col)

        # endpoint STORE passes (slots 0 and 1, ref :604-643)
        store = self._scan("store", num_inference_steps)
        _, kv0 = store(self.unet_params, inv0, ehs1)
        _, kv1 = store(self.unet_params, inv1, ehs1)

        # joint interp denoise: all frames batched, per-frame alpha;
        # with mesh= the frame axis shards over 'data' (kv0/kv1 replicated)
        interp = self._scan("interp", num_inference_steps)
        ehsN = self._prompt(prompt, num_frames)
        a_frames = jnp.asarray(alphas, jnp.float32)[:, None, None]
        if self.mesh is not None and num_frames > 1:
            # GSPMD needs the frame axis divisible by the 'data' axis;
            # pad by repeating the last frame, slice back after decode
            pad = self._frame_pad(num_frames)
            noises, ehsN, a_frames = (self._pad_rows(a, pad) for a in
                                      (noises, ehsN, a_frames))
            noises, ehsN, a_frames = self._shard_frames(noises, ehsN,
                                                        a_frames)
        out = interp(self.unet_params, noises, ehsN, kv0, kv1, a_frames)

        images = self._slice_rows(self._decode_chunked(out, decode_chunk),
                                  num_frames)
        if output_type == "np":
            return np.clip(np.asarray(images) / 2 + 0.5, 0, 1)
        return images
