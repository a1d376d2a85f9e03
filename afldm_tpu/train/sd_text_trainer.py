"""Text-conditioned SD finetune trainer — the corrected implementation of
the reference's stale ``sd_text`` trainer (afldm/trainers/
sd_text_trainer.py; broken by undefined ``mod_unet`` and
``shifter.translate`` calls, SURVEY.md §2.12 items 1-2). Objective: eps-MSE
with CLIP text conditioning + the CFA shift-equivariance loss, AF surgery on
the SD UNet (frozen AF-VAE + frozen text encoder)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import (UNet2DConditionModel, UNet2DConditionConfig,
                      AutoencoderKL, AutoencoderKLConfig, gaussian_sample)
from ..models.text_encoder import TextEncoder
from ..schedulers import DDPMScheduler
from ..shift.shifters import ImageShifter, gen_valid_mask
from ..shift.metrics import mask_mse
from .trainer import Trainer, TrainState, make_optimizer, load_json
from .ema import ema_update, EMAState


class SDTextTrainer(Trainer):

    def init_modules(self, vae_config=None, unet_config=None,
                     scheduler_config=None, text_encoder=None):
        cfg = self.cfg
        self.noise_scheduler = DDPMScheduler.from_config(
            scheduler_config or {"num_train_timesteps": 1000,
                                 "beta_schedule": "scaled_linear",
                                 "beta_start": 0.00085,
                                 "beta_end": 0.012})
        if vae_config is None:
            vae_config = load_json(os.path.join(cfg.vae_path, "config.json"))
        if isinstance(vae_config, dict):
            vae_config = AutoencoderKLConfig.from_diffusers(vae_config)
        self.vae_config = vae_config
        self.vae = AutoencoderKL(vae_config, dtype=self.weight_dtype)
        if unet_config is None:
            unet_config = UNet2DConditionConfig(alias_free=cfg.af_models)
        if isinstance(unet_config, dict):
            unet_config = UNet2DConditionConfig.from_diffusers(
                unet_config, alias_free=cfg.af_models)
        self.unet_config = unet_config
        self.unet = UNet2DConditionModel(unet_config, dtype=self.weight_dtype)
        self.text_encoder = text_encoder  # built lazily if None
        self.shifter = ImageShifter("ideal", vae_config.downsample_ratio)

    def init_optimizers(self, total_steps=None):
        self.tx = make_optimizer(
            self.cfg, total_steps,
            grad_accum=self.base_cfg.gradient_accumulation_steps)

    def prepare_modules(self, key=jax.random.PRNGKey(0), vae_params=None,
                        unet_params=None):
        if self.text_encoder is None:
            self.text_encoder = TextEncoder(
                getattr(self.cfg, "pretrained_model_name_or_path", None)
                or None)
        res = self.base_cfg.resolution
        lat_res = res // self.vae.config.downsample_ratio
        k1, k2 = jax.random.split(key)
        self.vae_params = self.replicate(
            vae_params if vae_params is not None
            else jax.jit(self.vae.init)(
                k1, jnp.zeros((1, res, res, 3), jnp.float32)))
        dim = self.unet_config.cross_attention_dim
        if unet_params is None:
            unet_params = jax.jit(self.unet.init)(
                k2, jnp.zeros((1, lat_res, lat_res, 4), jnp.float32),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1, 77, dim)))
        self.state = self.place_state(self.init_train_state(
            unet_params, self.tx, self.cfg.use_ema))
        self._step_fn = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        sched = self.noise_scheduler
        unet = self.unet
        vae = self.vae
        shifter = self.shifter
        d_factor = self.vae_config.downsample_ratio
        scaling = self.vae_config.scaling_factor
        tx = self.tx
        use_ema = cfg.use_ema
        resolution = self.base_cfg.resolution

        def loss_fn(params, vae_params, images, ehs, key):
            k_enc, k_noise, k_t, k_off = jax.random.split(key, 4)
            mean, logvar = vae.apply(vae_params, images, method="encode")
            latents = jax.lax.stop_gradient(
                gaussian_sample(k_enc, mean, logvar) * scaling)
            bsz = latents.shape[0]
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            t = jax.random.randint(k_t, (bsz,), 0, sched.num_train_timesteps)
            noisy = sched.add_noise(latents, noise, t)

            pred0, kv = unet.apply(params, noisy, t, ehs)
            mse = jnp.mean((pred0.astype(jnp.float32)
                            - noise.astype(jnp.float32)) ** 2)

            shift_loss = 0.0
            if cfg.use_shift_loss:
                max_off = int(resolution * 0.75 // 2)
                ti = jax.random.randint(k_off, (), -max_off, max_off + 1
                                        ).astype(jnp.float32) / d_factor
                tj = jax.random.randint(jax.random.fold_in(k_off, 1), (),
                                        -max_off, max_off + 1
                                        ).astype(jnp.float32) / d_factor
                mask = gen_valid_mask(noisy.shape, ti, tj)
                noisy_s, _ = shifter.shift(noisy, ti, tj)
                target, _ = shifter.shift(pred0, ti, tj)
                pred_s, _ = unet.apply(
                    params, noisy_s, t, ehs,
                    kv_in=kv if cfg.use_cross_attn else None)
                shift_loss = mask_mse(pred_s, target, mask)

            loss = mse + shift_loss
            return loss, {"train_loss": loss, "mse_loss": mse,
                          "shift_loss": jnp.asarray(shift_loss)}

        def step(state: TrainState, vae_params, images, ehs, key):
            (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, vae_params, images, ehs, key)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            if use_ema:
                est = ema_update(EMAState(params=state.ema_params,
                                          step=state.ema_step), params)
                ema_params, ema_step = est.params, est.step
            else:
                ema_params, ema_step = state.ema_params, state.ema_step
            return state.replace(params=params, opt_state=opt_state,
                                 ema_params=ema_params, ema_step=ema_step,
                                 step=state.step + 1), logs

        return jax.jit(step, donate_argnums=(0,))

    def training_step(self, global_step, batch) -> dict:
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.base_cfg.seed or 0), global_step)
        images = jnp.asarray(batch["input"])
        prompts = batch.get("caption", [""] * images.shape[0])
        # prompt dropout for CFG training (ref train.py prompt_dropout)
        if self.base_cfg.prompt_dropout > 0:
            rng = np.random.default_rng(global_step)
            prompts = ["" if rng.random() < self.base_cfg.prompt_dropout
                       else p for p in prompts]
        ehs = jnp.asarray(self.text_encoder.encode(list(prompts)))
        self.state, logs = self._step_fn(self.state, self.vae_params,
                                         self.shard(images), ehs, key)
        return {k: float(v) for k, v in logs.items()}

    def save_pipeline(self, output_dir):
        from .checkpoint import save_checkpoint
        import json as _json
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "unet_config.json"), "w") as f:
            _json.dump(self.unet_config.to_dict(), f, indent=2)
        with open(os.path.join(output_dir, "vae_config.json"), "w") as f:
            _json.dump(self.vae_config.to_dict(), f, indent=2)
        save_checkpoint(output_dir, int(self.state.step), {
            "unet": jax.device_get(self.state.params),
            "unet_ema": jax.device_get(self.state.ema_params)
            if self.state.ema_params is not None else {},
            "vae": jax.device_get(self.vae_params),
        })
