"""Latent I2SB super-resolution pipeline (ref afldm/pipelines/i2sb_pipeline.py:16-78):
encode the degraded image as the bridge start x1, run the I2SB posterior
(ODE mode for determinism), skip the final step, decode."""

import jax
import jax.numpy as jnp

from .ldm import LDMPipeline
from ..schedulers.i2sb import I2SBScheduler


class I2SBLDMPipeline(LDMPipeline):
    scheduler: I2SBScheduler

    def _get_denoiser(self, mode: str, num_steps: int, collect: bool):
        key = (mode, num_steps, collect)
        if key in self._denoise_cache:
            return self._denoise_cache[key]
        scheduler = self.scheduler
        unet = self.unet
        ts = jnp.asarray(scheduler.set_timesteps(num_steps))
        # skip the final step (ref i2sb_pipeline.py:47-49): iterate pairs
        # (t_i, t_{i+1}) for i < n-1
        ts_cur = ts[:-1]
        ts_prev = ts[1:]

        if mode == "store":
            @jax.jit
            def run(params, latents):
                def body(carry, x):
                    t, pt = x
                    eps, kv = unet.apply(params, carry, t)
                    nxt, _ = scheduler.step(eps, t, pt, carry, is_ode=True)
                    return nxt, (kv if collect else None)
                return jax.lax.scan(body, latents, (ts_cur, ts_prev))
        elif mode == "load":
            @jax.jit
            def run(params, latents, kv_traj):
                def body(carry, x):
                    t, pt, kv = x
                    eps, _ = unet.apply(params, carry, t, kv_in=kv)
                    nxt, _ = scheduler.step(eps, t, pt, carry, is_ode=True)
                    return nxt, None
                return jax.lax.scan(body, latents, (ts_cur, ts_prev, kv_traj))
        else:
            raise ValueError(f"I2SB pipeline has no '{mode}' mode")
        self._denoise_cache[key] = run
        return run

    def __call__(self, lq_images, num_inference_steps: int = 50,
                 output_type: str = "np"):
        """Super-resolve degraded images (already at target resolution, e.g.
        4x-bicubic-degraded then re-upsampled, ref shift_ldm_sr.py:45,109)."""
        x1 = self.encode(lq_images)  # deterministic .mode() encode
        latents, _ = self.denoise(x1, num_inference_steps)
        if output_type == "latent":
            return latents
        image = self.decode(latents)
        if output_type == "np":
            import numpy as np
            return np.clip(np.asarray(image) / 2 + 0.5, 0, 1)
        return image
