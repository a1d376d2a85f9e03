"""Latent-I2SB super-resolution shift-equivariance test (ref
scripts/shift_ldm_sr.py): degrade the input 4x, encode deterministically,
run the I2SB ODE (final step skipped), sweep fractional latent shifts with
CFA LOAD and compare against pixel-shifted outputs.

example:
  python scripts/shift_ldm_sr.py --num_inference_steps 50 --shift_steps 16 \
      --input_path img.png --output_path results/shift_sr.gif
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--shift_steps", type=int, default=16)
    p.add_argument("--output_path", type=str, default="results/shift_sr.gif")
    p.add_argument("--input_path", type=str, default=None)
    p.add_argument("--pipeline_dir", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from afldm_tpu.pipelines import I2SBLDMPipeline
    from afldm_tpu.pipelines.loading import (load_pipeline,
                                             init_random_pipeline)
    from afldm_tpu.pipelines.shift_eval import shift_equivariance_eval
    from afldm_tpu.train.i2sb_trainer import degrade_sr4x
    from afldm_tpu.utils.io import image_to_tensor, save_gif_from_tensors
    from afldm_tpu.shift.shifters import ImageShifter
    from afldm_tpu.shift.metrics import mask_psnr

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.pipeline_dir:
        pipe = load_pipeline(args.pipeline_dir, cls=I2SBLDMPipeline,
                             scheduler_config=json.load(
                                 open(os.path.join(
                                     root, "configs/sr/i2sb_scheduler.json"))))
    else:
        ucfg = json.load(open(os.path.join(root,
                                           "configs/ldm/model_unet.json")))
        vcfg = json.load(open(os.path.join(root,
                                           "configs/vae/model_afvae.json")))
        scfg = json.load(open(os.path.join(root,
                                           "configs/sr/i2sb_scheduler.json")))
        if args.tiny:
            ucfg.update(sample_size=8, block_out_channels=[32, 64],
                        down_block_types=["AttnDownBlock2D", "DownBlock2D"],
                        up_block_types=["UpBlock2D", "AttnUpBlock2D"],
                        layers_per_block=1, attention_head_dim=8,
                        norm_num_groups=8)
            vcfg.update(block_out_channels=[16, 16, 16, 16],
                        layers_per_block=1, norm_num_groups=8,
                        down_filtered_act=[False, True, True, True])
        pipe = init_random_pipeline(ucfg, vcfg, scfg, cls=I2SBLDMPipeline)

    res_img = pipe.unet.config.sample_size * pipe.vae.config.downsample_ratio
    if args.input_path:
        img = jnp.asarray(image_to_tensor(args.input_path,
                                          (res_img, res_img)))
    else:
        rng = np.random.default_rng(0)
        low = rng.standard_normal((res_img // 8, res_img // 8, 3))
        img = jnp.asarray(np.tanh(np.kron(low, np.ones((8, 8, 1))))[None],
                          jnp.float32)

    # bridge start: encode the degraded image (ref shift_ldm_sr.py:45,109)
    lq = jax.jit(degrade_sr4x)(img)
    init_latent = pipe.encode(lq)

    res = shift_equivariance_eval(pipe, num_inference_steps=
                                  args.num_inference_steps,
                                  num_shift_steps=args.shift_steps,
                                  init_latent=init_latent)

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    frames = []
    for k in range(args.shift_steps):
        out, gt = res.outputs[k], res.targets[k]
        frames.append(np.concatenate([out, gt, np.abs(out - gt)],
                                     axis=0)[None])
    save_gif_from_tensors(frames, args.output_path, denorm=True)

    for k, p in enumerate(res.psnrs, 1):
        print(f"shift {k}/8 px: masked PSNR {p:.3f} dB")
    print(f"mean shift-equivariance PSNR: {res.mean_psnr:.3f} dB")
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
