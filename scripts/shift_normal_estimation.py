"""Normal-estimation shift sweep (ref scripts/shift_normal_estimation.py):
YOSO single-step (t=999) normal prediction with latent ControlNet, shifting
both the starting latent and the conditioning latent, diff GIF + masked
PSNRs. Runs on random weights when no trained pipeline is given."""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--shift_steps", type=int, default=16)
    p.add_argument("--output_path", type=str,
                   default="results/shift_normal.gif")
    p.add_argument("--input_path", type=str, default=None)
    p.add_argument("--pipeline_dir", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    # the reference pipeline's non-YOSO branch
    # (normal_control_pipeline.py:389-396): full multi-step denoise loop
    p.add_argument("--no_yoso", action="store_true")
    p.add_argument("--num_inference_steps", type=int, default=20)
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--guess_mode", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from afldm_tpu.models import (UNet2DConditionModel,
                                  UNet2DConditionConfig, ControlNetModel,
                                  ControlNetConfig, AutoencoderKL,
                                  AutoencoderKLConfig)
    from afldm_tpu.schedulers import DDIMScheduler
    from afldm_tpu.pipelines import NormControlPipeline
    from afldm_tpu.utils.io import image_to_tensor, save_gif_from_tensors

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vcfg = json.load(open(os.path.join(root, "configs/vae/model_afvae.json")))
    if args.tiny:
        ucfg = UNet2DConditionConfig(
            sample_size=8, block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, attention_head_dim=2,
            cross_attention_dim=16, norm_num_groups=8, alias_free=True)
        vcfg.update(block_out_channels=[8, 8, 8, 8], layers_per_block=1,
                    norm_num_groups=4,
                    down_filtered_act=[False, True, True, True])
    else:
        ucfg = UNet2DConditionConfig(alias_free=True)
    vae_cfg = AutoencoderKLConfig.from_diffusers(vcfg)
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(vae_cfg)
    cn = ControlNetModel(ControlNetConfig.from_unet_config(ucfg))

    key = jax.random.PRNGKey(0)
    res = ucfg.sample_size * vae_cfg.downsample_ratio
    lat = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size, 4))
    ehs = jnp.zeros((1, 77, ucfg.cross_attention_dim))
    k1, k2, k3 = jax.random.split(key, 3)
    up = jax.jit(unet.init)(k1, lat, jnp.zeros((1,), jnp.int32), ehs)
    vp = jax.jit(vae.init)(k2, jnp.zeros((1, res, res, 3)))
    cp = jax.jit(cn.init)(k3, lat, jnp.zeros((1,), jnp.int32), ehs, lat)

    if args.pipeline_dir:
        from afldm_tpu.train.checkpoint import (latest_checkpoint,
                                                restore_checkpoint_lenient)
        ckpt = latest_checkpoint(args.pipeline_dir)
        state = restore_checkpoint_lenient(ckpt, {
            "unet": jax.device_get(up), "controlnet": jax.device_get(cp),
            "vae": jax.device_get(vp)})
        up, cp, vp = (jax.device_put(state.get("unet", up)),
                      jax.device_put(state.get("controlnet", cp)),
                      jax.device_put(state.get("vae", vp)))

    pipe = NormControlPipeline(vae, vp, unet, up, cn, cp,
                               DDIMScheduler(num_train_timesteps=1000))

    if args.input_path:
        img = jnp.asarray(image_to_tensor(args.input_path, (res, res)))
    else:
        rng = np.random.default_rng(0)
        low = rng.standard_normal((res // 8, res // 8, 3))
        img = jnp.asarray(np.tanh(np.kron(low, np.ones((8, 8, 1))))[None],
                          jnp.float32)

    out = pipe(img, num_shift_steps=args.shift_steps,
               is_yoso=not args.no_yoso,
               key=jax.random.PRNGKey(args.seed),
               num_inference_steps=args.num_inference_steps,
               guidance_scale=args.guidance_scale,
               guess_mode=args.guess_mode)

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    from afldm_tpu.shift.shifters import ImageShifter
    shifter = ImageShifter()
    frames = []
    base = out.normals[0:1]
    for k in range(1, args.shift_steps + 1):
        gt, _ = shifter.shift(jnp.asarray(base), 0.0, float(k))
        gt = np.asarray(gt)[0]
        o = out.normals[k]
        frames.append(np.concatenate([o, gt, np.abs(o - gt)], axis=0)[None])
    save_gif_from_tensors(frames, args.output_path, denorm=True)

    for k, p in enumerate(out.psnrs, 1):
        print(f"shift {k}/8 px: masked PSNR {p:.3f} dB")
    print(f"mean shift-equivariance PSNR: {out.mean_psnr:.3f} dB")
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
