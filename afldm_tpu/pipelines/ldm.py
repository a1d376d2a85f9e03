"""Unconditional latent-diffusion pipeline (ref afldm/pipelines/ldm_pipeline.py)
— TPU-native: the denoising loop is a single ``lax.scan`` over timesteps, and
cross-frame attention is an explicit per-step KV trajectory (a pytree of
``(steps, ...)`` arrays) instead of the reference's mutable processor dicts.

STORE pass  = ``denoise(latents)`` → also returns the KV trajectory (scan's
stacked ys). LOAD pass = ``denoise(latents, kv_traj=...)`` — per-step caches
ride in as scan xs. This replaces AttnState/CrossFrameAttnProcessor
(cross_frame_attn.py:6-130) with data flow.
"""

from functools import partial
import jax
import jax.numpy as jnp

from ..models.unet2d import UNet2DModel
from ..models.vae import AutoencoderKL, gaussian_sample
from ..schedulers.ddim import DDIMScheduler


class LDMPipeline:
    """Bundles (vae, unet, scheduler) with their params; all heavy methods
    are jitted once per (shape, step-count)."""

    def __init__(self, vae: AutoencoderKL, vae_params,
                 unet: UNet2DModel, unet_params,
                 scheduler: DDIMScheduler, scaling_factor: float = None):
        self.vae = vae
        self.vae_params = vae_params
        self.unet = unet
        self.unet_params = unet_params
        self.scheduler = scheduler
        self.scaling_factor = (scaling_factor if scaling_factor is not None
                               else vae.config.scaling_factor)
        self._encode = jax.jit(partial(vae.apply, method="encode"))
        self._decode = jax.jit(partial(vae.apply, method="decode"))
        self._denoise_cache = {}

    # -- VAE ------------------------------------------------------------------

    def encode(self, images, key=None):
        """image -> scaled latent; samples the posterior when a key is given,
        else uses the mode (ref scripts/shift_ldm_ffhq.py:38-41). A VQModel
        autoencoder returns pre-quantize latents directly (no posterior)."""
        out = self._encode(self.vae_params, images)
        if isinstance(out, tuple):
            mean, logvar = out
            z = (gaussian_sample(key, mean, logvar) if key is not None
                 else mean)
        else:
            z = out
        return z * self.scaling_factor

    def decode(self, latents):
        """scaled latent -> image (ref shift_ldm_ffhq.py:44-46)."""
        return self._decode(self.vae_params, latents / self.scaling_factor)

    # -- denoising scans --------------------------------------------------------

    def _get_denoiser(self, mode: str, num_steps: int, collect: bool):
        key = (mode, num_steps, collect)
        if key in self._denoise_cache:
            return self._denoise_cache[key]
        scheduler = self.scheduler
        unet = self.unet
        ts = jnp.asarray(scheduler.set_timesteps(num_steps))
        # previous timesteps are build-time constants — never derive them
        # from scheduler state inside the traced body (stale-state hazard)
        dt = scheduler.num_train_timesteps // num_steps
        ts_prev = ts - dt

        if mode == "store":
            @jax.jit
            def run(params, latents):
                def body(carry, x):
                    t, pt = x
                    eps, kv = unet.apply(params, carry, t)
                    nxt, _ = scheduler.step(eps, t, carry, prev_timestep=pt)
                    return nxt, (kv if collect else None)
                return jax.lax.scan(body, latents, (ts, ts_prev))
        elif mode == "load":
            @jax.jit
            def run(params, latents, kv_traj):
                def body(carry, x):
                    t, pt, kv = x
                    eps, _ = unet.apply(params, carry, t, kv_in=kv)
                    nxt, _ = scheduler.step(eps, t, carry, prev_timestep=pt)
                    return nxt, None
                return jax.lax.scan(body, latents, (ts, ts_prev, kv_traj))
        elif mode == "interp":
            @jax.jit
            def run(params, latents, kv_traj0, kv_traj1, alpha):
                def body(carry, x):
                    t, pt, kv0, kv1 = x
                    eps, _ = unet.apply(params, carry, t, kv_in=kv0,
                                        kv_in2=kv1, alpha=alpha)
                    nxt, _ = scheduler.step(eps, t, carry, prev_timestep=pt)
                    return nxt, None
                return jax.lax.scan(body, latents,
                                    (ts, ts_prev, kv_traj0, kv_traj1))
        elif mode == "invert":
            ts_up = ts[::-1]
            ts_prev = jnp.concatenate([jnp.asarray([-1]), ts_up[:-1]])

            @jax.jit
            def run(params, latents):
                def body(carry, x):
                    t, t_prev = x
                    eps, _ = unet.apply(params, carry, t)
                    nxt = scheduler.inversion_step(eps, t_prev, t, carry)
                    return nxt, None
                return jax.lax.scan(body, latents, (ts_up, ts_prev))[0]
        else:
            raise ValueError(mode)
        self._denoise_cache[key] = run
        return run

    def denoise(self, latents, num_inference_steps: int = 50, kv_traj=None,
                kv_traj2=None, alpha=None, collect_kv: bool = False):
        """Full denoise. Returns (latents, kv_trajectory-or-None)."""
        if kv_traj is None:
            run = self._get_denoiser("store", num_inference_steps, collect_kv)
            out, kv = run(self.unet_params, latents)
            return out, kv
        if kv_traj2 is None:
            run = self._get_denoiser("load", num_inference_steps, False)
            out, _ = run(self.unet_params, latents, kv_traj)
            return out, None
        run = self._get_denoiser("interp", num_inference_steps, False)
        out, _ = run(self.unet_params, latents, kv_traj, kv_traj2,
                     jnp.float32(alpha))
        return out, None

    def ddim_inversion(self, latents, num_inference_steps: int = 50):
        """Closed-form DDIM inversion (ref ldm_pipeline.py:133-160)."""
        run = self._get_denoiser("invert", num_inference_steps, False)
        return run(self.unet_params, latents)

    # -- generation -------------------------------------------------------------

    def __call__(self, batch_size: int = 1, key=None, latents=None,
                 num_inference_steps: int = 50, output_type: str = "np"):
        """Sample images (ref ldm_pipeline.py:32-131)."""
        cfg = self.unet.config
        if latents is None:
            assert key is not None
            latents = jax.random.normal(
                key, (batch_size, cfg.sample_size, cfg.sample_size,
                      cfg.in_channels), jnp.float32)
        latents = latents * self.scheduler.init_noise_sigma
        latents, _ = self.denoise(latents, num_inference_steps)
        if output_type == "latent":
            return latents
        image = self.decode(latents)
        if output_type == "np":
            import numpy as np
            return np.clip(np.asarray(image) / 2 + 0.5, 0, 1)
        return image
