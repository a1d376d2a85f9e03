"""AF-VAE trainer (ref afldm/trainers/vae_trainer.py:64-384): MSE +
perceptual + KL + encoder/decoder shift losses, with optional hinge-GAN
discriminator alternating by step parity and the adaptive generator weight
||grad(rec)|| / ||grad(g)|| at the decoder's output conv
(vae_trainer.py:19-27, 213-221)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import AutoencoderKL, AutoencoderKLConfig, Discriminator, \
    gaussian_sample, gaussian_kl
from ..shift.shifters import ImageShifter
from ..shift.metrics import mask_mse
from .trainer import Trainer, TrainState, make_optimizer, load_json
from .perceptual import perceptual_loss
from .ema import ema_update, EMAState


class VAETrainer(Trainer):

    def init_modules(self, vae_config=None, disc_config=None):
        cfg = self.cfg
        if vae_config is None:
            vae_config = load_json(cfg.model_cfg)
        if isinstance(vae_config, dict):
            vae_config = AutoencoderKLConfig.from_diffusers(vae_config)
        self.vae_config = vae_config
        self.model = AutoencoderKL(vae_config, dtype=self.weight_dtype)
        if cfg.use_disc:
            if disc_config is None:
                disc_config = load_json(cfg.disc_cfg) if cfg.disc_cfg else {}
            disc_config = {k: v for k, v in disc_config.items()
                           if not k.startswith("_")}
            self.discriminator = Discriminator(dtype=self.weight_dtype,
                                               **disc_config)
        else:
            self.discriminator = None
        d = vae_config.downsample_ratio
        self.img_shifter = ImageShifter("ideal_crop", 1)
        self.latent_shifter = ImageShifter("ideal_crop", d)
        self.d_factor = d
        if getattr(cfg, "lpips_vgg_path", ""):
            # swap the random-feature proxy for the real LPIPS VGG filters
            # (ref vae_trainer.py:107 lpips.LPIPS(net='vgg'))
            from .perceptual import load_lpips_vgg_features
            load_lpips_vgg_features(cfg.lpips_vgg_path)

    def init_optimizers(self, total_steps=None):
        self.tx = make_optimizer(
            self.cfg, total_steps,
            grad_accum=self.cfg.gradient_accumulation_steps,
            train_batch_size=self.base_cfg.train_batch_size)
        if self.cfg.use_disc:
            self.disc_tx = make_optimizer(self.cfg, total_steps)

    def prepare_modules(self, key=jax.random.PRNGKey(0)):
        res = self.base_cfg.resolution
        img = jnp.zeros((1, res, res, self.vae_config.in_channels),
                        jnp.float32)
        k1, k2 = jax.random.split(key)
        params = jax.jit(self.model.init)(k1, img)
        self.state = self.place_state(self.init_train_state(
            params, self.tx, self.cfg.use_ema))
        if self.cfg.use_disc:
            dparams = jax.jit(self.discriminator.init)(k2, img)
            self.disc_state = self.replicate(TrainState(
                params=dparams, opt_state=self.disc_tx.init(dparams),
                ema_params=None, ema_step=jnp.zeros((), jnp.int32),
                step=jnp.zeros((), jnp.int32)))
        self._g_step = self._build_g_step()
        self._d_step = self._build_d_step() if self.cfg.use_disc else None

    def _build_g_step(self):
        cfg = self.cfg
        model = self.model
        if self.base_cfg.gradient_checkpointing:
            # two-level rematerialization (ref train.py:130
            # enable_gradient_checkpointing): the outer jax.checkpoint makes
            # peak HBM max-over-segments instead of sum (the shift-loss step
            # runs 3 encodes + 2 decodes at 256px), and remat=True on the
            # model checkpoints each resnet block, so the re-run segment
            # holds only block boundaries + one block's internals instead of
            # a whole decoder of 256px activations
            inner = AutoencoderKL(self.vae_config, dtype=self.weight_dtype,
                                  remat=True)
            from .trainer import remat_policy
            policy = remat_policy(self.base_cfg.remat_policy)

            class _Remat:
                def __init__(self, m):
                    self._m = m
                    self._enc = jax.checkpoint(
                        lambda p, x: inner.apply(p, x, method="encode"),
                        policy=policy)
                    self._dec = jax.checkpoint(
                        lambda p, z: inner.apply(p, z, method="decode"),
                        policy=policy)

                def apply(self, params, x, method=None):
                    if method == "encode":
                        return self._enc(params, x)
                    if method == "decode":
                        return self._dec(params, x)
                    return self._m.apply(params, x)

                def __getattr__(self, k):
                    return getattr(self._m, k)

            model = _Remat(model)
        disc = self.discriminator
        img_shifter = self.img_shifter
        latent_shifter = self.latent_shifter
        d_factor = self.d_factor
        tx = self.tx
        use_ema = cfg.use_ema

        def loss_fn(params, disc_params, images, key):
            k_s1, k_s2, k_off1, k_off2 = jax.random.split(key, 4)
            mean, logvar = model.apply(params, images, method="encode")
            latents = gaussian_sample(k_s1, mean, logvar)
            recon = model.apply(params, latents, method="decode")

            mse = jnp.mean((images.astype(jnp.float32)
                            - recon.astype(jnp.float32)) ** 2)
            if cfg.perceptual_weight:
                p_loss = perceptual_loss(images.astype(jnp.float32),
                                         recon.astype(jnp.float32))
            else:  # don't pay the VGG forward when its weight is zero
                p_loss = jnp.asarray(0.0)
            kl = gaussian_kl(mean.astype(jnp.float32),
                             logvar.astype(jnp.float32))

            shift_loss = 0.0
            if cfg.use_shift_loss:
                h = images.shape[1]
                max_off = int(h * 0.75 // 2)
                ti = jax.random.randint(k_off1, (), -max_off, max_off + 1
                                        ).astype(jnp.float32)
                tj = jax.random.randint(k_off2, (), -max_off, max_off + 1
                                        ).astype(jnp.float32)
                # encoder: E(T x) vs T E(x)   (vae_trainer.py:187-198)
                f_x = jax.lax.stop_gradient(latents)
                t_f_x, mask = latent_shifter.shift(f_x, ti / d_factor,
                                                   tj / d_factor)
                t_x, _ = img_shifter.shift(images, ti, tj)
                f_t_x_mean, f_t_x_logvar = model.apply(params, t_x,
                                                       method="encode")
                f_t_x = gaussian_sample(k_s2, f_t_x_mean, f_t_x_logvar)
                enc_loss = mask_mse(f_t_x, t_f_x, mask)
                # decoder: D(T z) vs T D(z)   (vae_trainer.py:200-210)
                f_x2 = jax.lax.stop_gradient(recon)
                t_f_x2, mask2 = img_shifter.shift(f_x2, ti, tj)
                t_z, _ = latent_shifter.shift(jax.lax.stop_gradient(latents),
                                              ti / d_factor, tj / d_factor)
                f_t_x2 = model.apply(params, t_z, method="decode")
                dec_loss = mask_mse(f_t_x2, t_f_x2, mask2)
                shift_loss = enc_loss + dec_loss

            if cfg.use_disc and disc is not None:
                disc_loss = -jnp.mean(disc.apply(disc_params, recon))
            else:
                disc_loss = jnp.asarray(0.0)

            rec_total = mse + cfg.perceptual_weight * p_loss
            loss = (rec_total + shift_loss + cfg.kl_weight * kl)
            aux = {"mse_loss": mse, "shift_loss": jnp.asarray(shift_loss),
                   "kl_loss": kl, "perceptual_loss": p_loss,
                   "disc_loss": disc_loss, "rec_total": rec_total}
            return loss, aux

        def step(state: TrainState, disc_params, images, key):
            if cfg.use_disc:
                # adaptive disc weight from gradient norms at decoder
                # conv_out kernel (vae_trainer.py:19-27)
                def rec_loss_fn(p):
                    return loss_fn(p, disc_params, images, key)[1]["rec_total"]

                def g_loss_fn(p):
                    mean, logvar = self.model.apply(p, images,
                                                    method="encode")
                    latents = gaussian_sample(
                        jax.random.split(key, 4)[0], mean, logvar)
                    recon = self.model.apply(p, latents, method="decode")
                    return -jnp.mean(disc.apply(disc_params, recon))

                def out_kernel(g):
                    return g["params"]["decoder"]["conv_out"]["kernel"]

                nll_g = out_kernel(jax.grad(rec_loss_fn)(state.params))
                gan_g = out_kernel(jax.grad(g_loss_fn)(state.params))
                d_weight = jnp.clip(
                    jnp.linalg.norm(nll_g) / (jnp.linalg.norm(gan_g) + 1e-4),
                    0.0, 1e4)
                d_weight = jax.lax.stop_gradient(d_weight) * cfg.disc_weight
            else:
                d_weight = 0.0

            def total_loss(p):
                loss, aux = loss_fn(p, disc_params, images, key)
                return loss + d_weight * aux["disc_loss"], aux

            (loss, aux), grads = jax.value_and_grad(
                total_loss, has_aux=True)(state.params)
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
            aux["train_loss"] = loss
            return new_state, aux

        return jax.jit(step, donate_argnums=(0,))

    def _build_d_step(self):
        disc = self.discriminator
        model = self.model
        disc_tx = self.disc_tx

        def d_loss_fn(disc_params, params, images, key):
            mean, logvar = model.apply(params, images, method="encode")
            latents = gaussian_sample(key, mean, logvar)
            recon = jax.lax.stop_gradient(
                model.apply(params, latents, method="decode"))
            real = disc.apply(disc_params, images)
            fake = disc.apply(disc_params, recon)
            return jnp.mean(jax.nn.relu(1 + fake)
                            + jax.nn.relu(1 - real)) * 0.5

        def step(disc_state: TrainState, params, images, key):
            loss, grads = jax.value_and_grad(d_loss_fn)(
                disc_state.params, params, images, key)
            updates, opt_state = disc_tx.update(grads, disc_state.opt_state,
                                                disc_state.params)
            dparams = optax.apply_updates(disc_state.params, updates)
            return disc_state.replace(params=dparams, opt_state=opt_state,
                                      step=disc_state.step + 1), \
                {"train_loss_disc": loss}

        return jax.jit(step, donate_argnums=(0,))

    def training_step(self, global_step, batch) -> dict:
        key = jax.random.fold_in(
            jax.random.PRNGKey(self.base_cfg.seed or 0), global_step)
        images = self.shard(jnp.asarray(batch["input"]))
        is_gen = (not self.cfg.use_disc
                  or (global_step // self.cfg.gradient_accumulation_steps)
                  % 2 == 0)
        if is_gen:
            disc_params = (self.disc_state.params if self.cfg.use_disc
                           else {})
            self.state, logs = self._g_step(self.state, disc_params, images,
                                            key)
        else:
            self.disc_state, logs = self._d_step(self.disc_state,
                                                 self.state.params, images,
                                                 key)
        return {k: float(v) for k, v in logs.items()}

    def _valid_fns(self):
        """Jitted validation callables, cached per object (CLAUDE.md: no
        per-call jit closures — a 512px re-trace costs ~90 s host-side)."""
        fns = getattr(self, "_val_fns", None)
        if fns is None:
            from ..shift.metrics import psnr
            from .perceptual import (_features, _filters, _is_vgg,
                                     _LPIPS_SHIFT, _LPIPS_SCALE)
            bank = _filters()
            is_vgg = _is_vgg(bank)

            def batch_metrics(params, x):
                # one feature-bank pass per image feeds both the perceptual
                # distance and the pooled stats for the Frechet proxy
                rx, _, _ = self.model.apply(params, x)
                a, b = x, rx
                if is_vgg:
                    a = (a - _LPIPS_SHIFT) / _LPIPS_SCALE
                    b = (b - _LPIPS_SHIFT) / _LPIPS_SCALE
                fa = _features(a, bank, max_pool=is_vgg)
                fb = _features(b, bank, max_pool=is_vgg)
                perc = sum(jnp.mean((u - v) ** 2) for u, v in zip(fa, fb))
                return (jnp.mean((x - rx) ** 2), perc, psnr(x, rx),
                        fa[-1].mean(axis=(1, 2)), fb[-1].mean(axis=(1, 2)))

            fns = self._val_fns = {
                "apply": jax.jit(self.model.apply),
                "batch_metrics": jax.jit(batch_metrics),
            }
        return fns

    def validate(self, global_step, images=None):
        """Reconstruction preview of the first train samples + optional
        valid-set MSE/perceptual/PSNR when valid_data_dir is configured
        (ref vae_trainer.py:275-331)."""
        if images is None and getattr(self, "dataset", None) is not None:
            images = jnp.stack([
                jnp.asarray(self.dataset[i]["input"])
                for i in range(min(5, len(self.dataset)))])
        if images is None:
            return {}
        params = (self.state.ema_params
                  if self.cfg.use_ema and self.state.ema_params is not None
                  else self.state.params)
        fns = self._valid_fns()
        recon, mean, logvar = fns["apply"](params, images)
        out = {"val_mse": float(jnp.mean((recon - images) ** 2)),
               "recon": np.asarray(recon)}

        vdir = self.base_cfg.valid_data_dir
        if vdir and os.path.isdir(vdir):
            from .data import ImageFolderDataset, epoch_batches
            vds = ImageFolderDataset(vdir,
                                     resolution=self.base_cfg.resolution,
                                     random_flip=False)
            from ..utils.metric_utils import FeatureStats, frechet_distance
            # reconstruction FID proxy over the perceptual feature bank:
            # Frechet distance between valid-set and reconstruction
            # feature statistics (the role the reference's FeatureStats
            # plays for its FID loop, af_libs/metric_utils.py:211-302)
            st_real = FeatureStats(capture_mean_cov=True)
            st_recon = FeatureStats(capture_mean_cov=True)

            tot_mse = tot_p = tot_psnr = n = 0.0
            for b in epoch_batches(vds, min(4, len(vds)), seed=0):
                x = jnp.asarray(b["input"])
                mse, perc, p, px, prx = fns["batch_metrics"](params, x)
                tot_mse += float(mse) * x.shape[0]
                tot_p += float(perc) * x.shape[0]
                tot_psnr += float(p) * x.shape[0]
                st_real.append(px)
                st_recon.append(prx)
                n += x.shape[0]
            if n:
                out.update(valid_mse=tot_mse / n,
                           valid_perceptual=tot_p / n,
                           valid_psnr=tot_psnr / n,
                           valid_recon_ffd=frechet_distance(st_real,
                                                            st_recon))
        return out

    def save_pipeline(self, output_dir):
        from .checkpoint import save_checkpoint
        import json as _json
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "vae_config.json"), "w") as f:
            _json.dump(self.vae_config.to_dict(), f, indent=2)
        save_checkpoint(output_dir, int(self.state.step), {
            "vae": jax.device_get(self.state.params),
            "model_ema": jax.device_get(self.state.ema_params)
            if self.state.ema_params is not None else {},
        })
