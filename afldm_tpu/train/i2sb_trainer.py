"""I2SB super-resolution trainer (ref afldm/trainers/i2sb_trainer.py:126-399):
encode HQ and 4x-bicubic-degraded LQ with the deterministic posterior mode,
bridge them with I2SBScheduler.add_noise, regress compute_label, optional
CFA + shift loss (same pattern as the LDM trainer)."""

import os

import jax
import jax.numpy as jnp
import optax

from ..models import UNet2DModel, UNet2DConfig, AutoencoderKL, \
    AutoencoderKLConfig
from ..schedulers import I2SBScheduler
from ..shift.shifters import ImageShifter, gen_valid_mask
from ..shift.metrics import mask_mse
from ..ops.superresolution import build_sr4x
from .trainer import Trainer, TrainState, make_optimizer, load_json
from .ema import ema_update, EMAState

_SR4X_CACHE = {}


def degrade_sr4x(images, sr_filter="bicubic"):
    """Fixed 4x bicubic degradation + nearest re-upsample (ref
    i2sb_trainer.py:251-252 rebuilds build_sr4x per step; here the closure
    caches per image size)."""
    key = (images.shape[1], sr_filter)
    if key not in _SR4X_CACHE:
        _SR4X_CACHE[key] = build_sr4x(sr_filter, images.shape[1],
                                      images.shape[-1])
    return _SR4X_CACHE[key](images)


class I2SBTrainer(Trainer):

    def init_modules(self, vae_config=None, unet_config=None,
                     scheduler_config=None):
        cfg = self.cfg
        if scheduler_config is None:
            scheduler_config = load_json(cfg.scheduler_path)
        self.scheduler = I2SBScheduler.from_config(scheduler_config)

        if vae_config is None:
            p = os.path.join(cfg.vae_path, "vae", "config.json")
            if not os.path.exists(p):
                p = os.path.join(cfg.vae_path, "config.json")
            vae_config = load_json(p)
        if isinstance(vae_config, dict):
            vae_config = AutoencoderKLConfig.from_diffusers(vae_config)
        self.vae_config = vae_config
        self.vae = AutoencoderKL(vae_config, dtype=self.weight_dtype)

        if unet_config is None:
            unet_config = load_json(cfg.unet_config)
        if isinstance(unet_config, dict):
            unet_config = UNet2DConfig.from_diffusers(
                unet_config, alias_free=cfg.af_models)
        self.unet_config = unet_config
        self.unet = UNet2DModel(unet_config, dtype=self.weight_dtype)
        self.shifter = ImageShifter("ideal", vae_config.downsample_ratio)

    def init_optimizers(self, total_steps=None):
        self.tx = make_optimizer(
            self.cfg, total_steps,
            grad_accum=self.base_cfg.gradient_accumulation_steps)

    def prepare_modules(self, key=jax.random.PRNGKey(0), vae_params=None):
        res = self.base_cfg.resolution
        img = jnp.zeros((1, res, res, self.vae.config.in_channels),
                        jnp.float32)
        lat_res = res // self.vae.config.downsample_ratio
        lat = jnp.zeros((1, lat_res, lat_res,
                         self.unet.config.in_channels), jnp.float32)
        k1, k2 = jax.random.split(key)
        self.vae_params = self.replicate(
            vae_params if vae_params is not None
            else jax.jit(self.vae.init)(k1, img))
        unet_params = jax.jit(self.unet.init)(
            k2, lat, jnp.zeros((1,), jnp.int32))
        self.state = self.place_state(self.init_train_state(
            unet_params, self.tx, self.cfg.use_ema))
        self._step_fn = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        sched = self.scheduler
        unet = self.unet
        vae = self.vae
        shifter = self.shifter
        d_factor = self.vae_config.downsample_ratio
        scaling = self.vae_config.scaling_factor
        tx = self.tx
        use_ema = cfg.use_ema

        def loss_fn(params, vae_params, images, key):
            k_noise, k_t, k_off = jax.random.split(key, 3)
            lq = degrade_sr4x(images)
            # deterministic .mode() encodes (i2sb_trainer.py:255-262)
            x0 = vae.apply(vae_params, images, method="encode")[0] * scaling
            x1 = vae.apply(vae_params, lq, method="encode")[0] * scaling
            x0 = jax.lax.stop_gradient(x0)
            x1 = jax.lax.stop_gradient(x1)

            bsz = x0.shape[0]
            t = jax.random.randint(k_t, (bsz,), 0,
                                   sched.num_train_timesteps)
            xt = sched.add_noise(x0, x1, t, is_ode=cfg.is_ode, key=k_noise)
            label = sched.compute_label(t, x0, xt)

            pred0, kv = unet.apply(params, xt, t)
            if not cfg.use_cfa:
                kv = None
            loss_main = jnp.mean((pred0.astype(jnp.float32)
                                  - label.astype(jnp.float32)) ** 2)

            shift_loss = 0.0
            if cfg.use_cfa:
                # reference hardcodes int(128*0.75) for 256px inputs
                max_off = int(self.base_cfg.resolution * 0.75 // 2)
                ti = jax.random.randint(k_off, (), -max_off, max_off + 1
                                        ).astype(jnp.float32) / d_factor
                tj = jax.random.randint(jax.random.fold_in(k_off, 1), (),
                                        -max_off, max_off + 1
                                        ).astype(jnp.float32) / d_factor
                mask = gen_valid_mask(xt.shape, ti, tj)
                xt_s, _ = shifter.shift(xt, ti, tj)
                target, _ = shifter.shift(pred0, ti, tj)
                pred_s, _ = unet.apply(params, xt_s, t, kv_in=kv)
                shift_loss = mask_mse(pred_s, target, mask)

            loss = loss_main + shift_loss
            return loss, {"train_loss": loss, "mse_loss": loss_main,
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
            return state.replace(params=params, opt_state=opt_state,
                                 ema_params=ema_params, ema_step=ema_step,
                                 step=state.step + 1), logs

        return jax.jit(step, donate_argnums=(0,))

    def training_step(self, global_step, batch) -> dict:
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.base_cfg.seed or 0), global_step)
        images = self.shard(jnp.asarray(batch["input"]))
        self.state, logs = self._step_fn(self.state, self.vae_params,
                                         images, key)
        return {k: float(v) for k, v in logs.items()}

    def make_pipeline(self, use_ema=None):
        from ..pipelines import I2SBLDMPipeline
        use_ema = self.cfg.use_ema if use_ema is None else use_ema
        params = (self.state.ema_params if use_ema
                  and self.state.ema_params is not None
                  else self.state.params)
        return I2SBLDMPipeline(self.vae, self.vae_params, self.unet, params,
                               self.scheduler)

    def validate(self, global_step, images=None, num_steps=20):
        """PSNR of SR outputs on held-out images (ref i2sb_trainer.py:70-122)."""
        if images is None:
            return {}
        from ..shift.metrics import psnr
        pipe = self.make_pipeline()
        out = pipe(degrade_sr4x(images), num_inference_steps=num_steps,
                   output_type="pt")
        return {"val_psnr": float(psnr(out, images))}

    def save_pipeline(self, output_dir):
        from .checkpoint import save_checkpoint
        import json as _json
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "unet_config.json"), "w") as f:
            _json.dump(self.unet_config.to_dict(), f, indent=2)
        with open(os.path.join(output_dir, "scheduler_config.json"),
                  "w") as f:
            _json.dump(self.scheduler.config, f, indent=2)
        save_checkpoint(output_dir, int(self.state.step), {
            "unet": jax.device_get(self.state.params),
            "unet_ema": jax.device_get(self.state.ema_params)
            if self.state.ema_params is not None else {},
            "vae": jax.device_get(self.vae_params),
        })
