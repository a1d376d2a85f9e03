"""Video equivariant editing (ref
afldm/pipelines/video_equiv_editing_pipeline.py:128-748): edit each frame
with SD + classifier-free guidance while pinning every self-attention's K/V
to frame 0's trajectory (cross-frame attention), so the edit is consistent
and shift-equivariant across frames.

TPU-native structure:
- init latents via SDEdit (noise to the strength-truncated start timestep,
  ref :251-328) or per-frame DDIM inversion with frame-0 CFA
  (ref :591-607),
- one scan denoises frame 0 (CFG batch of 2) collecting the KV trajectory
  (ref save_activations :612-649),
- one scan denoises ALL frames jointly (CFG batch of 2N) with per-step KV
  LOAD — the reference's python loop over timesteps x frames collapses into
  a single compiled program,
- with ``mesh=`` the joint pass shards the FRAME axis over the mesh's
  'data' axis (SURVEY.md §5.7: frames are embarrassingly parallel between
  CFA syncs — every frame attends only to the replicated frame-0 KV
  trajectory, so GSPMD compiles a collective-free denoise and the videos
  that overflow one chip scale across the slice).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..models.vae import gaussian_sample
from ._frames import FrameShardingMixin


class VideoEquivEditingPipeline(FrameShardingMixin):
    def __init__(self, vae, vae_params, unet, unet_params, scheduler,
                 text_encoder=None, scaling_factor=None, mesh=None):
        self.vae = vae
        self.vae_params = vae_params
        self.unet = unet
        self.unet_params = unet_params
        self.scheduler = scheduler
        self.text_encoder = text_encoder
        self.scaling_factor = (scaling_factor if scaling_factor is not None
                               else vae.config.scaling_factor)
        self.mesh = mesh
        self._fns = {}

    # _shard_frames/_vae_fn/_pad_rows/_slice_rows come from
    # FrameShardingMixin (shared with ImageInterpolationPipeline)

    # -- helpers ----------------------------------------------------------------

    def encode_prompt(self, prompt, negative_prompt="", batch=1):
        if self.text_encoder is not None:
            cond = self.text_encoder.encode([prompt])
            uncond = self.text_encoder.encode([negative_prompt])
        else:
            dim = self.unet.config.cross_attention_dim
            cond = jnp.zeros((1, 77, dim), jnp.float32)
            uncond = jnp.zeros((1, 77, dim), jnp.float32)
        return (jnp.repeat(uncond, batch, axis=0),
                jnp.repeat(cond, batch, axis=0))

    def encode(self, images, key=None):
        mean, logvar = self._vae_fn("encode")(self.vae_params, images)
        z = gaussian_sample(key, mean, logvar) if key is not None else mean
        return z * self.scaling_factor

    def decode(self, latents):
        return self._vae_fn("decode")(self.vae_params,
                                      latents / self.scaling_factor)

    def get_timesteps(self, num_inference_steps, strength):
        """diffusers img2img truncation (ref :251-328)."""
        ts = self.scheduler.set_timesteps(num_inference_steps)
        init_t = min(int(num_inference_steps * strength),
                     num_inference_steps)
        if init_t < 1:
            raise ValueError(
                f"strength={strength} with num_inference_steps="
                f"{num_inference_steps} truncates to ZERO denoise steps; "
                f"raise strength to at least 1/num_inference_steps")
        return ts[num_inference_steps - init_t:]

    def _cfg_scan(self, num_steps, mode):
        """mode: 'store' (collect KV, CFG batch 2) or 'load'."""
        key = (mode, num_steps)
        if key in self._fns:
            return self._fns[key]
        unet, sched = self.unet, self.scheduler

        def cfg(eps, gs, gr):
            # CFG combine + optional rescale_noise_cfg (ref
            # video_equiv_editing_pipeline.py:52-65, "Common Diffusion
            # Noise Schedules..." sec 3.4): match the guided noise's
            # per-sample std to the text-conditioned prediction's
            eps_u, eps_c = jnp.split(eps, 2, axis=0)
            g = eps_u + gs * (eps_c - eps_u)
            axes = tuple(range(1, g.ndim))
            std_c = jnp.std(eps_c, axis=axes, keepdims=True)
            std_g = jnp.std(g, axis=axes, keepdims=True)
            rescaled = g * (std_c / (std_g + 1e-8))
            return gr * rescaled + (1 - gr) * g

        if mode == "store":
            @jax.jit
            def run(params, latents, ts, ts_prev, ehs, gs, gr=0.0):
                def body(carry, x):
                    t, pt = x
                    inp = jnp.concatenate([carry, carry], axis=0)
                    eps, kv = unet.apply(params, inp, t, ehs)
                    eps = cfg(eps, gs, gr)
                    nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
                    return nxt, kv
                return jax.lax.scan(body, latents, (ts, ts_prev))
        elif mode == "load":
            @jax.jit
            def run(params, latents, ts, ts_prev, ehs, gs, kv_traj, gr=0.0):
                def body(carry, x):
                    t, pt, kv = x
                    inp = jnp.concatenate([carry, carry], axis=0)
                    eps, _ = unet.apply(params, inp, t, ehs, kv_in=kv)
                    eps = cfg(eps, gs, gr)
                    nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
                    return nxt, None
                return jax.lax.scan(body, latents, (ts, ts_prev, kv_traj))
        elif mode == "invert_store":
            @jax.jit
            def run(params, latents, ts_up, ts_prev, ehs):
                def body(carry, x):
                    t, pt = x
                    eps, kv = unet.apply(params, carry, t, ehs)
                    nxt = sched.inversion_step(eps, pt, t, carry)
                    return nxt, kv
                return jax.lax.scan(body, latents, (ts_up, ts_prev))
        elif mode == "invert_load":
            @jax.jit
            def run(params, latents, ts_up, ts_prev, ehs, kv_traj):
                def body(carry, x):
                    t, pt, kv = x
                    eps, _ = unet.apply(params, carry, t, ehs, kv_in=kv)
                    nxt = sched.inversion_step(eps, pt, t, carry)
                    return nxt, None
                return jax.lax.scan(body, latents, (ts_up, ts_prev, kv_traj))
        else:
            raise ValueError(mode)
        self._fns[key] = run
        return run

    # -- main -------------------------------------------------------------------

    def __call__(self, frames, prompt, negative_prompt="",
                 inversion_prompt="", strength: float = 0.7,
                 num_inference_steps: int = 50, guidance_scale: float = 7.5,
                 guidance_rescale: float = 0.0,
                 use_inversion: bool = False, key=None,
                 output_type: str = "np", decode_chunk: int = None):
        n_frames = frames.shape[0]
        latents = self.encode(frames)
        ts = jnp.asarray(self.get_timesteps(num_inference_steps, strength))
        n_steps = len(ts)
        dt = (self.scheduler.num_train_timesteps // num_inference_steps)
        ts_prev = ts - dt

        if use_inversion:
            # ascending inversion over the truncated schedule with frame-0
            # CFA (ref :591-607)
            ts_up = ts[::-1]
            ts_up_prev = jnp.concatenate([jnp.asarray([-1]), ts_up[:-1]])
            inv_u, inv_c = self.encode_prompt(inversion_prompt, batch=1)
            store = self._cfg_scan(n_steps, "invert_store")
            lat0, inv_kv = store(self.unet_params, latents[0:1], ts_up,
                                 ts_up_prev, inv_c)
            if n_frames > 1:
                load = self._cfg_scan(n_steps, "invert_load")
                inv_cN = jnp.repeat(inv_c, n_frames - 1, axis=0)
                lat_rest, _ = load(self.unet_params, latents[1:], ts_up,
                                   ts_up_prev, inv_cN, inv_kv)
                init_latents = jnp.concatenate([lat0, lat_rest], axis=0)
            else:
                init_latents = lat0
        else:
            # SDEdit (ref :565-578)
            assert key is not None
            noise = jax.random.normal(key, latents.shape, latents.dtype)
            t0 = jnp.full((n_frames,), int(ts[0]), jnp.int32)
            if "add_noise" not in self._fns:   # jit once per pipeline
                self._fns["add_noise"] = jax.jit(self.scheduler.add_noise)
            init_latents = self._fns["add_noise"](latents, noise, t0)

        # frame-0 edit trajectory: CFG store pass (ref save_activations)
        uncond1, cond1 = self.encode_prompt(prompt, negative_prompt, 1)
        ehs1 = jnp.concatenate([uncond1, cond1], axis=0)
        store = self._cfg_scan(n_steps, "store")
        _, kv_traj = store(self.unet_params, init_latents[0:1], ts, ts_prev,
                           ehs1, jnp.float32(guidance_scale),
                           jnp.float32(guidance_rescale))

        # joint denoise of all frames with per-step KV LOAD + CFG
        uncondN, condN = self.encode_prompt(prompt, negative_prompt,
                                            n_frames)
        n_padded = n_frames
        if self.mesh is not None and n_frames > 1:
            # GSPMD needs the frame axis divisible by the 'data' axis;
            # pad by repeating the last frame, slice back after decode.
            # ehsN is CFG-doubled [uncond*N, cond*N] — pad each HALF so
            # the layout stays aligned with the padded latents
            pad = self._frame_pad(n_frames)
            n_padded = n_frames + pad
            init_latents = self._pad_rows(init_latents, pad)
            uncondN = self._pad_rows(uncondN, pad)
            condN = self._pad_rows(condN, pad)
        ehsN = jnp.concatenate([uncondN, condN], axis=0)
        load = self._cfg_scan(n_steps, "load")
        if self.mesh is not None and n_padded > 1:
            init_latents, ehsN = self._shard_frames(init_latents, ehsN)
        out_latents, _ = load(self.unet_params, init_latents, ts, ts_prev,
                              ehsN, jnp.float32(guidance_scale), kv_traj,
                              jnp.float32(guidance_rescale))

        images = self._slice_rows(
            self._decode_chunked(out_latents, decode_chunk), n_frames)
        if output_type == "np":
            return np.clip(np.asarray(images) / 2 + 0.5, 0, 1)
        return images
