"""Normal-estimation ControlNet trainer — corrected implementation of the
reference's stale ``norm_controlnet`` trainer (afldm/trainers/
sd_normal_controlnet.py; broken by undefined mod_controlnet /
shifter.translate / unimported metrics, SURVEY.md §2.12).

YOSO mode (sd_normal_controlnet.py:530-615): the input latent is zeros
(with prob ``zero_input_prob``) or pure noise at t=999, the target is the
clean normal latent (sample prediction), conditioning enters as the RGB
image's latent through the zero-init conv_in2 ControlNet. Only the UNet's
up blocks + the ControlNet train (sd_normal_controlnet.py:411-448) — done
here with an optax mask instead of requires_grad surgery."""

import os

import jax
import jax.numpy as jnp
import optax

from ..models import (UNet2DConditionModel, UNet2DConditionConfig,
                      ControlNetModel, ControlNetConfig,
                      AutoencoderKL, AutoencoderKLConfig)
from ..shift.shifters import ImageShifter, gen_valid_mask
from ..shift.metrics import mask_mse
from .trainer import Trainer, TrainState, make_optimizer, load_json


class NormControlNetTrainer(Trainer):

    def init_modules(self, vae_config=None, unet_config=None,
                     text_encoder=None):
        cfg = self.cfg
        if vae_config is None:
            vae_config = load_json(os.path.join(
                cfg.pretrained_model_name_or_path, "vae_config.json"))
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
        self.unet = UNet2DConditionModel(unet_config,
                                         dtype=self.weight_dtype)
        # down+mid-only AF surgery for the controlnet (ref make_af_controlnet,
        # af_api.py:86-93) comes for free: the controlnet only HAS down+mid.
        self.controlnet_config = ControlNetConfig.from_unet_config(
            unet_config)
        self.controlnet = ControlNetModel(self.controlnet_config,
                                          dtype=self.weight_dtype)
        self.text_encoder = text_encoder
        self.shifter = ImageShifter("ideal", vae_config.downsample_ratio)

    def init_optimizers(self, total_steps=None):
        base_tx = make_optimizer(self.cfg, total_steps)

        # trainable: the whole controlnet + the unet's up blocks + out head
        def unet_mask(params):
            def mark(path_key_tuple, _):
                top = path_key_tuple[1].key if len(path_key_tuple) > 1 else ""
                return ("train" if str(top).startswith(("up_blocks",
                                                        "conv_norm_out",
                                                        "conv_out"))
                        else "freeze")
            return jax.tree_util.tree_map_with_path(mark, params)

        self._unet_mask_fn = unet_mask
        self.tx = optax.multi_transform(
            {"train": base_tx, "freeze": optax.set_to_zero()}, unet_mask)
        self.cn_tx = make_optimizer(self.cfg, total_steps)

    def prepare_modules(self, key=jax.random.PRNGKey(0), vae_params=None,
                        unet_params=None):
        res = self.base_cfg.resolution
        lat_res = res // self.vae.config.downsample_ratio
        dim = self.unet_config.cross_attention_dim
        k1, k2, k3 = jax.random.split(key, 3)
        self.vae_params = self.replicate(
            vae_params if vae_params is not None
            else jax.jit(self.vae.init)(
                k1, jnp.zeros((1, res, res, 3), jnp.float32)))
        lat = jnp.zeros((1, lat_res, lat_res, 4), jnp.float32)
        ehs = jnp.zeros((1, 77, dim), jnp.float32)
        if unet_params is None:
            unet_params = jax.jit(self.unet.init)(
                k2, lat, jnp.zeros((1,), jnp.int32), ehs)
        cn_params = jax.jit(self.controlnet.init)(
            k3, lat, jnp.zeros((1,), jnp.int32), ehs, lat)
        self.state = self.place_state(self.init_train_state(
            unet_params, self.tx, False))
        self.cn_state = self.replicate(TrainState(
            params=cn_params, opt_state=self.cn_tx.init(cn_params),
            ema_params=None, ema_step=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32)))
        self._step_fn = self._build_step()

    def _build_step(self):
        cfg = self.cfg
        unet = self.unet
        cn = self.controlnet
        vae = self.vae
        shifter = self.shifter
        d_factor = self.vae_config.downsample_ratio
        scaling = self.vae_config.scaling_factor
        tx, cn_tx = self.tx, self.cn_tx
        resolution = self.base_cfg.resolution

        def forward(unet_params, cn_params, lat, cond, ehs, t, kv_in=None):
            down_res, mid_res, _ = cn.apply(cn_params, lat, t, ehs, cond)
            pred, kv = unet.apply(unet_params, lat, t, ehs,
                                  down_block_residuals=down_res,
                                  mid_block_residual=mid_res, kv_in=kv_in)
            return pred, kv

        def loss_fn(unet_params, cn_params, vae_params, images, normals,
                    ehs, key):
            k_zero, k_noise, k_off = jax.random.split(key, 3)
            cond = vae.apply(vae_params, images, method="encode")[0] * scaling
            target = vae.apply(vae_params, normals,
                               method="encode")[0] * scaling
            cond = jax.lax.stop_gradient(cond)
            target = jax.lax.stop_gradient(target)

            bsz = cond.shape[0]
            # YOSO: zeros with prob zero_input_prob, else pure noise, t=999
            use_zero = (jax.random.uniform(k_zero, (bsz, 1, 1, 1))
                        < cfg.zero_input_prob)
            noise = jax.random.normal(k_noise, cond.shape, cond.dtype)
            lat = jnp.where(use_zero, 0.0, noise)
            t = jnp.full((bsz,), 999, jnp.int32)

            pred0, kv = forward(unet_params, cn_params, lat, cond, ehs, t)
            mse = jnp.mean((pred0.astype(jnp.float32)
                            - target.astype(jnp.float32)) ** 2)

            shift_loss = 0.0
            if cfg.use_shift_loss:
                max_off = int(resolution * 0.75 // 2)
                ti = jax.random.randint(k_off, (), -max_off, max_off + 1
                                        ).astype(jnp.float32) / d_factor
                tj = jax.random.randint(jax.random.fold_in(k_off, 1), (),
                                        -max_off, max_off + 1
                                        ).astype(jnp.float32) / d_factor
                mask = gen_valid_mask(cond.shape, ti, tj)
                cond_s, _ = shifter.shift(cond, ti, tj)
                lat_s, _ = shifter.shift(lat, ti, tj)
                tgt_s, _ = shifter.shift(pred0, ti, tj)
                pred_s, _ = forward(unet_params, cn_params, lat_s, cond_s,
                                    ehs, t, kv_in=kv)
                shift_loss = mask_mse(pred_s, tgt_s, mask)

            loss = mse + shift_loss
            return loss, {"train_loss": loss, "mse_loss": mse,
                          "shift_loss": jnp.asarray(shift_loss)}

        def step(state, cn_state, vae_params, images, normals, ehs, key):
            (loss, logs), (g_unet, g_cn) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, cn_state.params, vae_params, images, normals,
                ehs, key)
            u_updates, u_opt = tx.update(g_unet, state.opt_state,
                                         state.params)
            new_unet = optax.apply_updates(state.params, u_updates)
            c_updates, c_opt = cn_tx.update(g_cn, cn_state.opt_state,
                                            cn_state.params)
            new_cn = optax.apply_updates(cn_state.params, c_updates)
            return (state.replace(params=new_unet, opt_state=u_opt,
                                  step=state.step + 1),
                    cn_state.replace(params=new_cn, opt_state=c_opt,
                                     step=cn_state.step + 1), logs)

        return jax.jit(step, donate_argnums=(0, 1))

    def training_step(self, global_step, batch) -> dict:
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.base_cfg.seed or 0), global_step)
        images = self.shard(jnp.asarray(batch["input"]))
        normals = self.shard(jnp.asarray(
            batch.get("normal", batch["input"])))
        dim = self.unet_config.cross_attention_dim
        if self.text_encoder is not None:
            ehs = jnp.asarray(self.text_encoder.encode(
                [""] * images.shape[0]))
        else:
            ehs = jnp.zeros((images.shape[0], 77, dim), jnp.float32)
        self.state, self.cn_state, logs = self._step_fn(
            self.state, self.cn_state, self.vae_params, images, normals,
            ehs, key)
        return {k: float(v) for k, v in logs.items()}

    def save_pipeline(self, output_dir):
        from .checkpoint import save_checkpoint
        import json as _json
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "unet_config.json"), "w") as f:
            _json.dump(self.unet_config.to_dict(), f, indent=2)
        with open(os.path.join(output_dir,
                               "controlnet_config.json"), "w") as f:
            _json.dump(self.controlnet_config.to_dict(), f, indent=2)
        save_checkpoint(output_dir, int(self.state.step), {
            "unet": jax.device_get(self.state.params),
            "controlnet": jax.device_get(self.cn_state.params),
            "vae": jax.device_get(self.vae_params),
        })
