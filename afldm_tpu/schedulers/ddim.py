"""DDIM scheduler — the subset of diffusers' DDIMScheduler the reference
exercises (sampling step with eta, add_noise, closed-form inversion; see
MyLDMPipeline, afldm/pipelines/ldm_pipeline.py:80-160 and
configs/ldm/noise_scheduler.json).

Pure-function design: the schedule tables are precomputed numpy constants;
``step``/``add_noise``/``inversion_step`` are jit-traceable in the timestep
(tables are gathered with ``jnp.take``), so whole samplers compile into one
``lax.scan``.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .common import make_betas, rescale_zero_terminal_snr, spaced_timesteps


class DDIMScheduler:
    init_noise_sigma = 1.0
    order = 1

    def __init__(self,
                 num_train_timesteps: int = 1000,
                 beta_start: float = 0.0001,
                 beta_end: float = 0.02,
                 beta_schedule: str = "linear",
                 trained_betas=None,
                 clip_sample: bool = True,
                 set_alpha_to_one: bool = True,
                 steps_offset: int = 0,
                 prediction_type: str = "epsilon",
                 thresholding: bool = False,
                 clip_sample_range: float = 1.0,
                 timestep_spacing: str = "leading",
                 rescale_betas_zero_snr: bool = False,
                 **unused):
        self.config = dict(
            num_train_timesteps=num_train_timesteps, beta_start=beta_start,
            beta_end=beta_end, beta_schedule=beta_schedule,
            trained_betas=(None if trained_betas is None
                           else list(np.asarray(trained_betas, np.float64))),
            clip_sample=clip_sample, set_alpha_to_one=set_alpha_to_one,
            steps_offset=steps_offset, prediction_type=prediction_type,
            clip_sample_range=clip_sample_range,
            timestep_spacing=timestep_spacing,
            rescale_betas_zero_snr=rescale_betas_zero_snr,
        )
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas
        self.alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
        self.final_alpha_cumprod = (np.float32(1.0) if set_alpha_to_one
                                    else self.alphas_cumprod[0])
        self.num_train_timesteps = num_train_timesteps
        self.prediction_type = prediction_type
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        self.num_inference_steps = None
        self.timesteps = np.arange(num_train_timesteps)[::-1].copy()

        # device-side table for traced-timestep gathers
        self._acp = jnp.asarray(self.alphas_cumprod)

    @classmethod
    def from_config(cls, config: dict):
        return cls(**{k: v for k, v in config.items()
                      if not k.startswith("_")})

    def scale_model_input(self, sample, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps: int):
        """Returns the descending timestep array (also stored)."""
        self.num_inference_steps = num_inference_steps
        self.timesteps = spaced_timesteps(
            self.num_train_timesteps, num_inference_steps,
            self.config["timestep_spacing"], self.config["steps_offset"])
        return self.timesteps

    # -- pure pieces ---------------------------------------------------------

    def _alpha(self, t):
        """alphas_cumprod[t] with t possibly traced; t < 0 yields
        final_alpha_cumprod."""
        t = jnp.asarray(t)
        a = jnp.take(self._acp, jnp.clip(t, 0, self.num_train_timesteps - 1))
        return jnp.where(t >= 0, a, jnp.float32(self.final_alpha_cumprod))

    def _pred_x0_eps(self, model_output, sample, alpha_prod_t,
                     use_clipped_model_output=False):
        beta_prod_t = 1 - alpha_prod_t
        p = self.prediction_type
        if p == "epsilon":
            x0 = (sample - beta_prod_t ** 0.5 * model_output) / alpha_prod_t ** 0.5
            eps = model_output
        elif p == "sample":
            x0 = model_output
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5
        elif p == "v_prediction":
            x0 = alpha_prod_t ** 0.5 * sample - beta_prod_t ** 0.5 * model_output
            eps = alpha_prod_t ** 0.5 * model_output + beta_prod_t ** 0.5 * sample
        else:
            raise ValueError(p)
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        if use_clipped_model_output:
            # diffusers re-derives eps from the (possibly clipped) x0 only
            # under this flag — clip_sample alone clips x0 but keeps the
            # raw model output for the direction term
            eps = (sample - alpha_prod_t ** 0.5 * x0) / beta_prod_t ** 0.5
        return x0, eps

    def step(self, model_output, timestep, sample, eta: float = 0.0,
             key=None, prev_timestep=None,
             use_clipped_model_output: bool = False):
        """One DDIM update x_t -> x_{t-Δ}; timestep may be traced. Returns
        (prev_sample, pred_original_sample).

        Pass ``prev_timestep`` explicitly inside jitted samplers: deriving it
        from ``self.num_inference_steps`` reads mutable python state at
        *trace* time, which goes stale if another ``set_timesteps`` call
        happened between builds/retraces of the compiled function."""
        if prev_timestep is not None:
            prev_t = jnp.asarray(prev_timestep)
        else:
            assert self.num_inference_steps is not None, \
                "call set_timesteps first"
            dt = self.num_train_timesteps // self.num_inference_steps
            prev_t = jnp.asarray(timestep) - dt

        alpha_prod_t = self._alpha(timestep)
        alpha_prod_prev = self._alpha(prev_t)
        x0, eps = self._pred_x0_eps(model_output, sample, alpha_prod_t,
                                    use_clipped_model_output)

        if eta > 0:
            variance = ((1 - alpha_prod_prev) / (1 - alpha_prod_t)
                        * (1 - alpha_prod_t / alpha_prod_prev))
            std = eta * variance ** 0.5
        else:
            std = 0.0

        dir_xt = (1 - alpha_prod_prev - std ** 2) ** 0.5 * eps
        prev = alpha_prod_prev ** 0.5 * x0 + dir_xt
        if eta > 0:
            assert key is not None
            prev = prev + std * jax.random.normal(key, sample.shape,
                                                  sample.dtype)
        return prev, x0

    def inversion_step(self, model_output, timestep_prev, timestep, latent):
        """Closed-form DDIM inversion x_{t-Δ} -> x_t (ref
        ldm_pipeline.py:133-160): given eps at the *current* latent, recover
        x0 under (mu_prev, sigma_prev) and re-noise under (mu, sigma)."""
        alpha_prod_t = self._alpha(timestep)
        alpha_prod_prev = self._alpha(timestep_prev)
        mu = alpha_prod_t ** 0.5
        mu_prev = alpha_prod_prev ** 0.5
        sigma = (1 - alpha_prod_t) ** 0.5
        sigma_prev = (1 - alpha_prod_prev) ** 0.5
        pred_x0 = (latent - sigma_prev * model_output) / mu_prev
        return mu * pred_x0 + sigma * model_output

    def add_noise(self, original_samples, noise, timesteps):
        a = self._alpha(timesteps)
        while a.ndim < original_samples.ndim:
            a = a[..., None]
        return a ** 0.5 * original_samples + (1 - a) ** 0.5 * noise

    def get_velocity(self, sample, noise, timesteps):
        a = self._alpha(timesteps)
        while a.ndim < sample.ndim:
            a = a[..., None]
        return a ** 0.5 * noise - (1 - a) ** 0.5 * sample
