"""LDM trainer — eps-MSE + CFA shift-equivariance loss
(ref afldm/trainers/ldm_trainer.py:104-358), as one jitted DP train step.

The reference's two UNet passes with mutable CFA state (STORE then LOAD,
ldm_trainer.py:240-260) become: pass 1 returns the KV cache, pass 2 consumes
it. Offsets are drawn with an explicit PRNG key; the shift is the ideal
(FFT) shifter at the VAE downsample ratio with integer-image-pixel offsets
up to ±0.75*128 (ldm_trainer.py:233-237)."""

import os

import jax
import jax.numpy as jnp
import optax

from ..models import UNet2DModel, UNet2DConfig, AutoencoderKL, \
    AutoencoderKLConfig, gaussian_sample
from ..schedulers import DDPMScheduler, DDIMScheduler
from ..shift.shifters import ImageShifter, gen_valid_mask
from ..shift.metrics import mask_mse
from .trainer import Trainer, TrainState, make_optimizer, load_json
from .ema import ema_update, EMAState


class LDMTrainer(Trainer):

    def init_modules(self, vae_config=None, unet_config=None,
                     scheduler_config=None):
        """Configs may be passed directly (tests) or read from the paths in
        cfg (reference behavior, ldm_trainer.py:104-129)."""
        cfg = self.cfg
        if scheduler_config is None:
            scheduler_config = load_json(cfg.scheduler_path)
        self.noise_scheduler = DDPMScheduler.from_config(scheduler_config)
        self.noise_scheduler.prediction_type = cfg.prediction_type

        if vae_config is None:
            p = os.path.join(cfg.vae_path, "vae", "config.json")
            if not os.path.exists(p):
                p = os.path.join(cfg.vae_path, "vae_config.json")
            if not os.path.exists(p):
                p = os.path.join(cfg.vae_path, "config.json")
            vae_config = load_json(p)
        if isinstance(vae_config, dict):
            if cfg.is_vqvae:
                from ..models.vq import VQModelConfig
                vae_config = VQModelConfig.from_diffusers(vae_config)
            else:
                vae_config = AutoencoderKLConfig.from_diffusers(vae_config)
        if cfg.is_vqvae:
            # VQ-VAE autoencoder (ref ldm_trainer.py:113-115; training
            # consumes PRE-quantize .latents, :213-214)
            from ..models.vq import VQModel, VQModelConfig
            if isinstance(vae_config, AutoencoderKLConfig):
                vae_config = VQModelConfig.from_diffusers(
                    vae_config.to_dict())
            self.vae = VQModel(vae_config, dtype=self.weight_dtype)
        else:
            self.vae = AutoencoderKL(vae_config, dtype=self.weight_dtype)

        if unet_config is None:
            if cfg.unet_path:  # init from a saved pipeline/ckpt dir
                p = os.path.join(cfg.unet_path, "unet_config.json")
                if not os.path.exists(p):
                    p = os.path.join(cfg.unet_path, "config.json")
                unet_config = load_json(p)
            else:
                unet_config = load_json(cfg.unet_config)
        if isinstance(unet_config, dict):
            unet_config = UNet2DConfig.from_diffusers(
                unet_config, alias_free=cfg.af_models)
        self.unet = UNet2DModel(unet_config, dtype=self.weight_dtype)
        self.unet_config = unet_config
        self.vae_config = vae_config
        self.shifter = ImageShifter("ideal",
                                    vae_config.downsample_ratio)

    @staticmethod
    def _load_saved_params(path, skeleton, prefer):
        """Restore one entry of a trainer save_pipeline checkpoint dir
        (the reference's from_pretrained for vae_path/unet_path,
        ldm_trainer.py:117-123). ``skeleton`` must match the saved layout
        (LDM: unet/unet_ema/vae; VAE: vae/model_ema); returns the first
        non-empty entry of ``prefer`` or None when no checkpoint exists /
        the layout differs."""
        from .checkpoint import (latest_checkpoint,
                                 restore_checkpoint_lenient)
        ckpt = latest_checkpoint(path)
        if ckpt is None:
            return None
        # lenient: the saved layout varies by config (EMA off writes {},
        # VAE-only dirs have no unet) — strict restore would raise and a
        # swallowed error here silently trained against RANDOM weights
        state = restore_checkpoint_lenient(
            ckpt, {k: jax.device_get(v) for k, v in skeleton.items()})
        for k in prefer:
            if state.get(k):
                return state[k]
        return None

    def init_optimizers(self, total_steps=None):
        self.tx = make_optimizer(
            self.cfg, total_steps,
            grad_accum=self.base_cfg.gradient_accumulation_steps,
            train_batch_size=self.base_cfg.train_batch_size)

    def init_params(self, key, vae_params=None):
        res = self.base_cfg.resolution
        img = jnp.zeros((1, res, res, self.vae.config.in_channels),
                        jnp.float32)
        lat_res = res // self.vae.config.downsample_ratio
        lat = jnp.zeros((1, lat_res, lat_res,
                         self.unet.config.in_channels), jnp.float32)
        k1, k2 = jax.random.split(key)
        rand_vae = (vae_params if vae_params is not None
                    else jax.jit(self.vae.init)(k1, img))
        unet_params = jax.jit(self.unet.init)(
            k2, lat, jnp.zeros((1,), jnp.int32))
        ldm_skel = {"unet": unet_params, "unet_ema": unet_params,
                    "vae": rand_vae}
        if vae_params is None:
            vae_params = rand_vae
            if self.cfg.vae_path and os.path.isdir(self.cfg.vae_path):
                # frozen pretrained VAE (ref ldm_trainer.py:117-118); the
                # dir may be a VAE-trainer save_pipeline (vae/model_ema)
                # or an LDM run (unet/unet_ema/vae — e.g. the reference SR
                # config inits its VAE from the FFHQ AFLDM run)
                loaded = (self._load_saved_params(
                    self.cfg.vae_path,
                    {"vae": rand_vae, "model_ema": rand_vae},
                    ("model_ema", "vae"))
                    or self._load_saved_params(self.cfg.vae_path, ldm_skel,
                                               ("vae",)))
                if loaded is not None:
                    vae_params = loaded
        self.vae_params = vae_params
        if self.cfg.unet_path and os.path.isdir(self.cfg.unet_path):
            # continue from a trained UNet (ref ldm_trainer.py:120-123)
            loaded = self._load_saved_params(self.cfg.unet_path, ldm_skel,
                                             ("unet",))
            if loaded is not None:
                unet_params = loaded
        return unet_params

    def prepare_modules(self, key=jax.random.PRNGKey(0), vae_params=None):
        unet_params = self.init_params(key, vae_params)
        self.state = self.place_state(self.init_train_state(
            unet_params, self.tx, self.cfg.use_ema))
        self.vae_params = self.replicate(self.vae_params)
        self._step_fn = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        sched = self.noise_scheduler
        unet = self.unet
        vae = self.vae

        if self.base_cfg.gradient_checkpointing:
            # rematerialize UNet activations in the backward pass
            # (ref train.py:130 enable_gradient_checkpointing); policy
            # "dots" keeps MXU outputs and recomputes only elementwise
            from .trainer import remat_policy
            policy = remat_policy(self.base_cfg.remat_policy)

            def unet_apply(params, x, t, kv_in=None):
                def f(params, x, t, kv_in):
                    return unet.apply(params, x, t, kv_in=kv_in)
                return jax.checkpoint(f, policy=policy)(params, x, t, kv_in)
        else:
            def unet_apply(params, x, t, kv_in=None):
                return unet.apply(params, x, t, kv_in=kv_in)
        shifter = self.shifter
        d_factor = self.vae_config.downsample_ratio
        scaling = self.vae_config.scaling_factor
        tx = self.tx
        use_ema = cfg.use_ema

        is_vqvae = cfg.is_vqvae

        def loss_fn(params, vae_params, images, key):
            k_enc, k_noise, k_t, k_off = jax.random.split(key, 4)
            if is_vqvae:
                # pre-quantize latents (ref ldm_trainer.py:213-214)
                latents = vae.apply(vae_params, images,
                                    method="encode") * scaling
            else:
                mean, logvar = vae.apply(vae_params, images,
                                         method="encode")
                latents = gaussian_sample(k_enc, mean, logvar) * scaling
            latents = jax.lax.stop_gradient(latents)

            bsz = latents.shape[0]
            noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
            t = jax.random.randint(k_t, (bsz,), 0,
                                   sched.num_train_timesteps)
            noisy = sched.add_noise(latents, noise, t)

            # random integer image-space offset; the reference hardcodes
            # int(128*0.75)=96 for 256px images (ldm_trainer.py:233-237) —
            # generalized here to resolution * 0.75 / 2
            max_off = int(self.base_cfg.resolution * 0.75 // 2)
            ti = jax.random.randint(k_off, (), -max_off, max_off + 1
                                    ).astype(jnp.float32) / d_factor
            tj = jax.random.randint(jax.random.fold_in(k_off, 1), (),
                                    -max_off, max_off + 1
                                    ).astype(jnp.float32) / d_factor

            if cfg.use_shift_loss and cfg.use_cross_attn:
                pred0, kv = unet_apply(params, noisy, t)
            else:
                pred0, kv = unet_apply(params, noisy, t)
                kv = None

            shift_loss = 0.0
            if cfg.use_shift_loss:
                mask = gen_valid_mask(noisy.shape, ti, tj)
                cache = shifter.precompute(noisy)
                shifted_noisy, _ = shifter.shift(noisy, ti, tj, cache=cache)
                target, _ = shifter.shift(pred0, ti, tj)
                pred_s, _ = unet_apply(params, shifted_noisy, t, kv_in=kv)
                if cfg.use_stop_grad:
                    shift_loss = mask_mse(jax.lax.stop_gradient(pred_s),
                                          target, mask)
                else:
                    shift_loss = mask_mse(pred_s, target, mask)

            ori_loss = jnp.mean((pred0.astype(jnp.float32)
                                 - noise.astype(jnp.float32)) ** 2)
            loss = ori_loss + shift_loss
            return loss, {"train_loss": loss, "mse_loss": ori_loss,
                          "shift_loss": jnp.asarray(shift_loss)}

        def step(state: TrainState, vae_params, images, key):
            (loss, logs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, vae_params, images, key)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            if use_ema:
                est = ema_update(EMAState(params=state.ema_params,
                                          step=state.ema_step), params)
                ema_params, ema_step = est.params, est.step
            else:
                ema_params, ema_step = state.ema_params, state.ema_step
            new_state = state.replace(params=params, opt_state=opt_state,
                                      ema_params=ema_params,
                                      ema_step=ema_step,
                                      step=state.step + 1)
            return new_state, logs

        state_sh = self.state_shardings(self.state) \
            if hasattr(self, "state") else self.replicated
        return jax.jit(step, donate_argnums=(0,),
                       in_shardings=(state_sh, self.replicated,
                                     self.data_sharding, self.replicated),
                       out_shardings=(state_sh, self.replicated))

    def training_step(self, global_step, batch) -> dict:
        key = jax.random.fold_in(jax.random.PRNGKey(
            self.base_cfg.seed or 0), global_step)
        images = self.shard(jnp.asarray(batch["input"]))
        self.state, logs = self._step_fn(self.state, self.vae_params,
                                         images, self.replicate(key))
        return {k: float(v) for k, v in logs.items()}

    # -- validation / export ---------------------------------------------------

    def make_pipeline(self, use_ema=None):
        from ..pipelines import LDMPipeline
        use_ema = self.cfg.use_ema if use_ema is None else use_ema
        params = (self.state.ema_params if use_ema and
                  self.state.ema_params is not None else self.state.params)
        ddim = DDIMScheduler(
            **{k: v for k, v in self.noise_scheduler.config.items()
               if k in ("num_train_timesteps", "beta_start", "beta_end",
                        "beta_schedule", "clip_sample", "steps_offset",
                        "timestep_spacing")},
            set_alpha_to_one=False)
        return LDMPipeline(self.vae, self.vae_params, self.unet, params,
                           ddim)

    def validate(self, global_step, num_images=4, num_steps=20):
        """20-step DDIM samples (ref ldm_trainer.py:293-309)."""
        pipe = self.make_pipeline()
        imgs = pipe(batch_size=num_images,
                    key=jax.random.PRNGKey(self.cfg.valid_seed),
                    num_inference_steps=num_steps)
        return {"samples": imgs}

    def save_pipeline(self, output_dir):
        from .checkpoint import save_checkpoint
        os.makedirs(output_dir, exist_ok=True)
        import json as _json
        with open(os.path.join(output_dir, "unet_config.json"), "w") as f:
            _json.dump(self.unet_config.to_dict(), f, indent=2)
        with open(os.path.join(output_dir, "scheduler_config.json"),
                  "w") as f:
            _json.dump(self.noise_scheduler.config, f, indent=2)
        with open(os.path.join(output_dir, "vae_config.json"), "w") as f:
            _json.dump(self.vae_config.to_dict(), f, indent=2)
        save_checkpoint(output_dir, int(self.state.step), {
            "unet": jax.device_get(self.state.params),
            "unet_ema": jax.device_get(self.state.ema_params)
            if self.state.ema_params is not None else {},
            "vae": jax.device_get(self.vae_params),
        })
