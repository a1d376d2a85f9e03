"""I2SB (image-to-image Schrödinger bridge) scheduler — TPU-native rebuild
of the reference's I2SBScheduler (afldm/schedulers/i2sb_scheduler.py:142-531).

State is precomputed numpy tables (std_fwd / std_bwd / posterior coefs);
``step`` / ``add_noise`` / ``compute_label`` are pure and traced-timestep
safe, so the ODE sampler compiles into a single ``lax.scan``. The
reference's dead ``_get_variance`` / ``get_velocity`` paths (SURVEY.md
§2.12 item 7) are intentionally not replicated.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .common import make_betas, rescale_zero_terminal_snr, spaced_timesteps


def compute_gaussian_product_coef(sigma1, sigma2):
    """p1*p2 = N(coef1*x0 + coef2*x1, var) for p1=N(x_t|x0, s1^2),
    p2=N(x_t|x1, s2^2) (ref i2sb_scheduler.py:131-139)."""
    denom = sigma1 ** 2 + sigma2 ** 2
    coef1 = sigma2 ** 2 / denom
    coef2 = sigma1 ** 2 / denom
    var = (sigma1 ** 2 * sigma2 ** 2) / denom
    return coef1, coef2, var


class I2SBScheduler:
    init_noise_sigma = 1.0
    order = 1

    def __init__(self,
                 num_train_timesteps: int = 1000,
                 beta_start: float = 0.0001,
                 beta_end: float = 0.02,
                 beta_schedule: str = "linear",
                 trained_betas=None,
                 clip_sample: bool = True,
                 prediction_type: str = "epsilon",
                 thresholding: bool = False,
                 clip_sample_range: float = 1.0,
                 timestep_spacing: str = "leading",
                 steps_offset: int = 0,
                 rescale_betas_zero_snr: bool = False,
                 **unused):
        self.config = dict(
            num_train_timesteps=num_train_timesteps, beta_start=beta_start,
            beta_end=beta_end, beta_schedule=beta_schedule,
            trained_betas=(None if trained_betas is None
                           else list(np.asarray(trained_betas, np.float64))),
            clip_sample=clip_sample, prediction_type=prediction_type,
            clip_sample_range=clip_sample_range,
            timestep_spacing=timestep_spacing, steps_offset=steps_offset,
            rescale_betas_zero_snr=rescale_betas_zero_snr,
        )
        betas = make_betas(num_train_timesteps, beta_start, beta_end,
                           beta_schedule, trained_betas)
        if rescale_betas_zero_snr:
            betas = rescale_zero_terminal_snr(betas)
        self.betas = betas

        # forward/backward marginal stds and SB posterior coefficients
        # (ref i2sb_scheduler.py:188-197)
        std_fwd = np.sqrt(np.cumsum(betas))
        std_bwd = np.sqrt(np.cumsum(betas[::-1])[::-1])
        mu_x0, mu_x1, var = compute_gaussian_product_coef(std_fwd, std_bwd)
        self.std_fwd = std_fwd.astype(np.float32)
        self.std_bwd = std_bwd.astype(np.float32)
        self.std_sb = np.sqrt(var).astype(np.float32)
        self.mu_x0 = mu_x0.astype(np.float32)
        self.mu_x1 = mu_x1.astype(np.float32)

        self.num_train_timesteps = num_train_timesteps
        self.clip_sample = clip_sample
        self.clip_sample_range = clip_sample_range
        self.num_inference_steps = None
        self.timesteps = np.arange(num_train_timesteps)[::-1].copy()

        self._std_fwd = jnp.asarray(self.std_fwd)
        self._mu_x0 = jnp.asarray(self.mu_x0)
        self._mu_x1 = jnp.asarray(self.mu_x1)
        self._std_sb = jnp.asarray(self.std_sb)

    @classmethod
    def from_config(cls, config: dict):
        return cls(**{k: v for k, v in config.items()
                      if not k.startswith("_")})

    def scale_model_input(self, sample, timestep=None):
        return sample

    def set_timesteps(self, num_inference_steps=None, timesteps=None):
        """Equal spacing or custom descending timesteps
        (ref i2sb_scheduler.py:224-302)."""
        if (num_inference_steps is not None) == (timesteps is not None):
            raise ValueError(
                "pass exactly one of num_inference_steps / timesteps")
        if timesteps is not None:
            ts = np.asarray(timesteps, dtype=np.int64)
            if np.any(np.diff(ts) >= 0):
                raise ValueError("custom timesteps must be descending")
            if ts[0] >= self.num_train_timesteps:
                raise ValueError("timesteps must start below "
                                 f"{self.num_train_timesteps}")
            self.num_inference_steps = None
            self.custom_timesteps = True
        else:
            ts = spaced_timesteps(self.num_train_timesteps,
                                  num_inference_steps,
                                  self.config["timestep_spacing"],
                                  self.config["steps_offset"])
            self.num_inference_steps = num_inference_steps
            self.custom_timesteps = False
        self.timesteps = ts
        return ts

    def _gather(self, table, t, x_ndim):
        t = jnp.asarray(t)
        v = jnp.take(table, jnp.clip(t, 0, self.num_train_timesteps - 1))
        while v.ndim < x_ndim:
            v = v[..., None]
        return v

    def step(self, model_output, timestep, prev_timestep, sample,
             is_ode=False, key=None):
        """Posterior step between two bridge times (ref
        i2sb_scheduler.py:382-459). ``prev_timestep`` is explicit (the
        reference derives it from Python state; in a scan we pass the next
        element of the timestep array; use -1 after the last step — the
        std_fwd gather clamps to index 0 whose std is essentially 0).
        Returns (prev_sample, pred_original_sample)."""
        t = jnp.asarray(timestep)
        prev_t = jnp.asarray(prev_timestep)

        std_fwd = self._gather(self._std_fwd, t, sample.ndim)
        std_fwd_prev = jnp.where(
            prev_t >= 0,
            self._gather(self._std_fwd, prev_t, sample.ndim),
            jnp.zeros(()))
        std_delta = jnp.sqrt(jnp.maximum(std_fwd ** 2 - std_fwd_prev ** 2,
                                         0.0))

        pred_x0 = sample - std_fwd * model_output
        if self.clip_sample:
            pred_x0 = jnp.clip(pred_x0, -self.clip_sample_range,
                               self.clip_sample_range)

        mu_x0, mu_xt, var = compute_gaussian_product_coef(std_fwd_prev,
                                                          std_delta)
        prev = mu_x0 * pred_x0 + mu_xt * sample

        if not is_ode and key is not None:
            noise = jax.random.normal(key, sample.shape, sample.dtype)
            prev = prev + jnp.where(t > 0, jnp.sqrt(var), 0.0) * noise
        return prev, pred_x0

    def add_noise(self, x0, x1, timesteps, is_ode=False, noise=None,
                  key=None):
        """Bridge marginal x_t = mu_x0 x0 + mu_x1 x1 (+ std_sb eps)
        (ref i2sb_scheduler.py:461-485)."""
        mu_x0 = self._gather(self._mu_x0, timesteps, x0.ndim)
        mu_x1 = self._gather(self._mu_x1, timesteps, x0.ndim)
        xt = mu_x0 * x0 + mu_x1 * x1
        if not is_ode:
            if noise is None:
                assert key is not None
                noise = jax.random.normal(key, xt.shape, xt.dtype)
            std_sb = self._gather(self._std_sb, timesteps, x0.ndim)
            xt = xt + std_sb * noise
        return xt

    def compute_label(self, timesteps, x0, xt):
        """Training target (xt - x0) / std_fwd (ref i2sb_scheduler.py:507-513)."""
        std_fwd = self._gather(self._std_fwd, timesteps, x0.ndim)
        return (xt - x0) / std_fwd

    def __len__(self):
        return self.num_train_timesteps
