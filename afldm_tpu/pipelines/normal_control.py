"""Normal estimation with a latent-space ControlNet (ref
afldm/pipelines/normal_control_pipeline.py:76-451 + scripts/
shift_normal_estimation.py): YOSO single-step mode denoises once at t=999
from a zero (or random) latent, conditioning on the encoded input image;
the shift sweep moves BOTH the starting latent and the conditioning latent
and scores masked PSNR against the pixel-shifted first output.

The reference's stale ``shifter.translate`` calls (SURVEY.md §2.12 item 1)
are the fixed ``shift`` here. All shifted variants run as ONE batch."""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..shift.shifters import ImageShifter
from ..shift.metrics import mask_psnr


@dataclass
class NormalEstimationResult:
    normals: np.ndarray      # (1 + num_shift_steps, H, W, 3)
    psnrs: np.ndarray        # (num_shift_steps,)

    @property
    def mean_psnr(self):
        return float(self.psnrs.mean())


class NormControlPipeline:
    def __init__(self, vae, vae_params, unet, unet_params, controlnet,
                 controlnet_params, scheduler, text_encoder=None,
                 scaling_factor=None):
        self.vae = vae
        self.vae_params = vae_params
        self.unet = unet
        self.unet_params = unet_params
        self.controlnet = controlnet
        self.controlnet_params = controlnet_params
        self.scheduler = scheduler
        self.text_encoder = text_encoder
        self.scaling_factor = (scaling_factor if scaling_factor is not None
                               else vae.config.scaling_factor)
        self._fns = {}

    def _encode_fn(self):
        if "encode" not in self._fns:
            vae, s = self.vae, self.scaling_factor

            @jax.jit
            def f(params, img):
                mean, _ = vae.apply(params, img, method="encode")
                return mean * s
            self._fns["encode"] = f
        return self._fns["encode"]

    def _decode_fn(self):
        if "decode" not in self._fns:
            vae, s = self.vae, self.scaling_factor

            @jax.jit
            def f(params, z):
                return vae.apply(params, z / s, method="decode")
            self._fns["decode"] = f
        return self._fns["decode"]

    def _yoso_fn(self):
        """Single-step prediction at t=999: the model regresses the clean
        normal latent directly (ref normal_control_pipeline.py:304-396,
        trainers/sd_normal_controlnet.py:530-615)."""
        if "yoso" not in self._fns:
            unet, cn = self.unet, self.controlnet

            @jax.jit
            def f(unet_params, cn_params, latents, cond_latents, ehs):
                t = jnp.full((latents.shape[0],), 999, jnp.int32)
                down_res, mid_res, _ = cn.apply(cn_params, latents, t, ehs,
                                                cond_latents)
                pred, _ = unet.apply(unet_params, latents, t, ehs,
                                     down_block_residuals=down_res,
                                     mid_block_residual=mid_res)
                return pred
            self._fns["yoso"] = f
        return self._fns["yoso"]

    def prompt_embeds(self, batch, prompt=""):
        if self.text_encoder is not None:
            e = self.text_encoder.encode([prompt])
        else:
            dim = self.unet.config.cross_attention_dim
            e = jnp.zeros((1, 77, dim), jnp.float32)
        return jnp.repeat(e, batch, axis=0)

    def _denoise_fn(self, num_steps, do_cfg, guess_mode):
        """Multi-step ControlNet denoise scan (the reference's non-YOSO
        branch, normal_control_pipeline.py:389-396): per step the ControlNet
        residuals are recomputed and injected into the UNet, with CFG
        (2x batch) and guess-mode handling (ControlNet runs on the
        conditional half only; residuals are zero-padded for the uncond
        half — ref :352-356). Jitted once per (steps, cfg, guess) combo."""
        key = ("denoise", num_steps, do_cfg, guess_mode)
        if key in self._fns:
            return self._fns[key]
        unet, cn, sched = self.unet, self.controlnet, self.scheduler

        @jax.jit
        def run(unet_params, cn_params, latents, cond_latents, ehs_u, ehs_c,
                ts, ts_prev, gs):
            def body(carry, x):
                t, pt = x
                if do_cfg:
                    inp = jnp.concatenate([carry, carry], axis=0)
                    ehs = jnp.concatenate([ehs_u, ehs_c], axis=0)
                    if guess_mode:
                        d, m, _ = cn.apply(cn_params, carry, t, ehs_c,
                                           cond_latents, guess_mode=True)
                        d = tuple(jnp.concatenate([jnp.zeros_like(r), r], 0)
                                  for r in d)
                        m = jnp.concatenate([jnp.zeros_like(m), m], 0)
                    else:
                        cond2 = jnp.concatenate([cond_latents, cond_latents],
                                                axis=0)
                        d, m, _ = cn.apply(cn_params, inp, t, ehs, cond2)
                    eps, _ = unet.apply(unet_params, inp, t, ehs,
                                        down_block_residuals=d,
                                        mid_block_residual=m)
                    eu, ec = jnp.split(eps, 2, axis=0)
                    eps = eu + gs * (ec - eu)
                else:
                    d, m, _ = cn.apply(cn_params, carry, t, ehs_c,
                                       cond_latents, guess_mode=guess_mode)
                    eps, _ = unet.apply(unet_params, carry, t, ehs_c,
                                        down_block_residuals=d,
                                        mid_block_residual=m)
                nxt, _ = sched.step(eps, t, carry, prev_timestep=pt)
                return nxt, None

            return jax.lax.scan(body, latents, (ts, ts_prev))[0]

        self._fns[key] = run
        return run

    def __call__(self, image, num_shift_steps: int = 16, from_zero=True,
                 key=None, prompt="", is_yoso: bool = True,
                 num_inference_steps: int = 20, guidance_scale: float = 1.0,
                 guess_mode: bool = False,
                 negative_prompt="") -> NormalEstimationResult:
        ratio = self.vae.config.downsample_ratio
        shifter = ImageShifter("ideal_crop", upsample_ratio=ratio)
        img_shifter = ImageShifter()

        encode = self._encode_fn()
        decode = self._decode_fn()
        yoso = self._yoso_fn()

        cond0 = encode(self.vae_params, image)
        n, hl, wl, cl = cond0.shape
        if not is_yoso:
            # the multi-step branch starts from pure noise
            # (ref normal_control_pipeline.py:304-308 prepare_latents)
            assert key is not None, "non-YOSO mode needs a PRNG key"
            lat0 = (jax.random.normal(key, cond0.shape, cond0.dtype)
                    * self.scheduler.init_noise_sigma)
        elif from_zero:
            lat0 = jnp.zeros_like(cond0)
        else:
            assert key is not None
            lat0 = jax.random.normal(key, cond0.shape, cond0.dtype)

        # base + all shifts in one batch (shift the cond latent with the
        # ideal shifter; the starting latent shifts identically — zeros are
        # shift-invariant, noise is shifted for parity with the reference).
        # Jitted ONCE per (pipeline, num_shift_steps) — see CLAUDE.md on
        # per-call jit closures.
        pkey = ("prep", num_shift_steps)
        if pkey not in self._fns:
            @jax.jit
            def prep(cond, lat):
                cache_c = shifter.precompute(cond)
                cache_l = shifter.precompute(lat)
                conds, lats, masks = [cond], [lat], [jnp.ones_like(cond)]
                for k in range(1, num_shift_steps + 1):
                    tj = k / ratio
                    c, m = shifter.shift(cond, 0.0, tj, cache=cache_c)
                    l, _ = shifter.shift(lat, 0.0, tj, cache=cache_l)
                    conds.append(c)
                    lats.append(l)
                    masks.append(m)
                return (jnp.concatenate(conds, 0), jnp.concatenate(lats, 0),
                        jnp.concatenate(masks, 0))
            self._fns[pkey] = prep

        conds, lats, masks = self._fns[pkey](cond0, lat0)
        ehs = self.prompt_embeds(conds.shape[0], prompt)
        if is_yoso:
            preds = yoso(self.unet_params, self.controlnet_params, lats,
                         conds, ehs)
        else:
            do_cfg = guidance_scale > 1.0
            ehs_u = self.prompt_embeds(conds.shape[0], negative_prompt)
            ts = jnp.asarray(
                self.scheduler.set_timesteps(num_inference_steps))
            dt = self.scheduler.num_train_timesteps // num_inference_steps
            ts_prev = ts - dt
            run = self._denoise_fn(num_inference_steps, do_cfg, guess_mode)
            preds = run(self.unet_params, self.controlnet_params, lats,
                        conds, ehs_u, ehs, ts, ts_prev,
                        jnp.asarray(guidance_scale, jnp.float32))
        # decode in chunks: the alias-free VAE's 2x-oversampled
        # intermediates for all (1 + num_shift_steps) frames at once
        # exhaust HBM at 512 px (17 x 1024^2 x C maps). Pad to a chunk
        # multiple so the jitted decode compiles ONE batch shape.
        scaled = preds * masks
        chunk = 4
        total = scaled.shape[0]
        pad = (-total) % chunk
        if pad:
            scaled = jnp.concatenate(
                [scaled, jnp.zeros((pad,) + scaled.shape[1:],
                                   scaled.dtype)], axis=0)
        normals = jnp.concatenate(
            [decode(self.vae_params, scaled[i:i + chunk])
             for i in range(0, scaled.shape[0], chunk)], axis=0)[:total]

        # masked PSNR of each shifted output vs pixel-shifted base output
        # (jitted once per shift count)
        skey = ("score", num_shift_steps)
        if skey in self._fns:
            psnrs = self._fns[skey](normals)
            return NormalEstimationResult(normals=np.asarray(normals),
                                          psnrs=np.asarray(psnrs))

        @jax.jit
        def score(normals):
            base = normals[0:1]
            psnrs = []
            for k in range(1, num_shift_steps + 1):
                gt, m = img_shifter.shift(base, 0.0, float(k))
                psnrs.append(mask_psnr(normals[k:k + 1], gt, m))
            return jnp.stack(psnrs)

        self._fns[skey] = score
        psnrs = score(normals)
        return NormalEstimationResult(normals=np.asarray(normals),
                                      psnrs=np.asarray(psnrs))
