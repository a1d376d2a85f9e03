"""Shift-equivariance evaluation — the headline benchmark protocol
(ref scripts/shift_ldm_ffhq.py:49-159, BASELINE.md): denoise a latent with
CFA STORE, then denoise fractionally shifted copies with CFA LOAD and
compare the decoded results against the pixel-shifted reference
reconstruction under a validity mask.

TPU-native deviation (results identical, wall-clock ~num_shift_steps times
lower): all shifted latents are denoised in ONE batched LOAD pass — the KV
cache is batch-broadcast — instead of the reference's sequential per-shift
runs."""

from dataclasses import dataclass
import numpy as np
import jax
import jax.numpy as jnp

from ..shift.shifters import ImageShifter
from ..shift.metrics import mask_psnr


@dataclass
class ShiftEvalResult:
    psnrs: np.ndarray          # (num_shift_steps,) masked PSNR per shift
    outputs: np.ndarray        # (num_shift_steps, H, W, 3) decoded shifted
    targets: np.ndarray        # (num_shift_steps, H, W, 3) GT-shifted recon
    masks: np.ndarray          # (num_shift_steps, H, W, 1)

    @property
    def mean_psnr(self):
        return float(self.psnrs.mean())


def shift_equivariance_eval(pipeline, key=None, num_inference_steps: int = 50,
                            num_shift_steps: int = 16,
                            init_latent=None, input_image=None,
                            batch_shifts: bool = True) -> ShiftEvalResult:
    cfg = pipeline.unet.config
    downsample_ratio = pipeline.vae.config.downsample_ratio

    latent_shifter = ImageShifter("ideal_crop",
                                  upsample_ratio=downsample_ratio)
    image_shifter = ImageShifter()  # bilinear

    if init_latent is None:
        if input_image is not None:
            z = pipeline.encode(input_image, key=key)
            init_latent = pipeline.ddim_inversion(z, num_inference_steps)
        else:
            assert key is not None
            init_latent = jax.random.normal(
                key, (1, cfg.sample_size, cfg.sample_size, cfg.in_channels),
                jnp.float32)

    # STORE pass + reference reconstruction
    denoised, kv_traj = pipeline.denoise(init_latent, num_inference_steps,
                                         collect_kv=True)
    rec_img = pipeline.decode(denoised)

    # all fractional shifts tj = k/ratio, k = 1..num_shift_steps
    # (jitted: the TPU runtime requires compiled dispatch)
    @jax.jit
    def prep(lat):
        cache = latent_shifter.precompute(lat)
        shifted, masks = [], []
        for k in range(1, num_shift_steps + 1):
            s, m = latent_shifter.shift(lat, 0.0, k / downsample_ratio,
                                        cache=cache)
            shifted.append(s)
            masks.append(m)
        return (jnp.concatenate(shifted, axis=0),
                jnp.concatenate(masks, axis=0))

    shifted, lat_masks = prep(init_latent)

    mul = jax.jit(jnp.multiply)
    if batch_shifts:
        den_shifted, _ = pipeline.denoise(shifted, num_inference_steps,
                                          kv_traj=kv_traj)
        outputs = pipeline.decode(mul(den_shifted, lat_masks))
    else:
        outs = []
        for i in range(num_shift_steps):
            d, _ = pipeline.denoise(shifted[i:i + 1], num_inference_steps,
                                    kv_traj=kv_traj)
            outs.append(pipeline.decode(mul(d, lat_masks[i:i + 1])))
        outputs = jnp.concatenate(outs, axis=0)

    # ground truth: pixel-space bilinear shift of the reference recon
    @jax.jit
    def gt_and_psnr(rec, outs):
        targets, img_masks, psnrs = [], [], []
        for k in range(1, num_shift_steps + 1):
            gt, m = image_shifter.shift(rec, 0.0, float(k))
            targets.append(gt)
            img_masks.append(m)
            psnrs.append(mask_psnr(outs[k - 1:k], gt, m))
        return (jnp.concatenate(targets, axis=0),
                jnp.concatenate(img_masks, axis=0),
                jnp.stack(psnrs))

    targets, img_masks, psnrs = gt_and_psnr(rec_img, outputs)

    return ShiftEvalResult(
        psnrs=np.asarray(psnrs),
        outputs=np.asarray(outputs),
        targets=np.asarray(targets),
        masks=np.asarray(img_masks),
    )
