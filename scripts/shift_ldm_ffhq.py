"""FFHQ-256 fractional-shift equivariance test (ref
scripts/shift_ldm_ffhq.py): denoise a latent with CFA STORE, sweep
1/8..k/8-pixel latent shifts with CFA LOAD (batched on TPU), write an
(output | GT-shift | |diff|) GIF strip and print masked PSNR per shift.

Without a trained pipeline directory it runs on random weights (the
published `SingleZombie/alias_free_ldm_ffhq` checkpoint is not fetchable in
a zero-egress build) — the protocol, mask, and metric plumbing are identical
either way.

example:
  python scripts/shift_ldm_ffhq.py --num_inference_steps 50 \
      --shift_steps 16 --output_path results/shift_ldm.gif
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
    p.add_argument("--output_path", type=str,
                   default="results/shift_ldm.gif")
    p.add_argument("--input_path", type=str, default=None)
    p.add_argument("--pipeline_dir", type=str, default=None,
                   help="trained pipeline directory (trainer save_pipeline)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny random model for smoke runs")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 compute (FFT/circulant islands stay f32 — "
                        "ops/ideal_lpf casts internally)")
    p.add_argument("--af_precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="circulant-matmul precision ('high': 3-pass, "
                        "~4e-5 err, faster VAE decode)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    from afldm_tpu.ops import set_af_precision
    set_af_precision(args.af_precision)
    from afldm_tpu.pipelines import shift_equivariance_eval
    from afldm_tpu.pipelines.loading import (load_pipeline,
                                             init_random_pipeline)
    from afldm_tpu.utils.io import image_to_tensor, save_gif_from_tensors

    import jax.numpy as jnp
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.pipeline_dir:
        pipe = load_pipeline(args.pipeline_dir, dtype=dtype)
    else:
        with open(os.path.join(root, "configs/ldm/model_unet.json")) as f:
            ucfg = json.load(f)
        with open(os.path.join(root, "configs/vae/model_afvae.json")) as f:
            vcfg = json.load(f)
        with open(os.path.join(root,
                               "configs/ldm/noise_scheduler.json")) as f:
            scfg = json.load(f)
        if args.tiny:
            ucfg.update(sample_size=8, block_out_channels=[32, 64],
                        down_block_types=["AttnDownBlock2D", "DownBlock2D"],
                        up_block_types=["UpBlock2D", "AttnUpBlock2D"],
                        layers_per_block=1, attention_head_dim=8,
                        norm_num_groups=8)
            vcfg.update(block_out_channels=[16, 16, 16, 16],
                        layers_per_block=1, norm_num_groups=8,
                        down_filtered_act=[False, True, True, True])
        pipe = init_random_pipeline(ucfg, vcfg, scfg, dtype=dtype)

    input_image = None
    if args.input_path:
        size = (pipe.unet.config.sample_size
                * pipe.vae.config.downsample_ratio,) * 2
        input_image = image_to_tensor(args.input_path, size)

    res = shift_equivariance_eval(
        pipe, key=jax.random.PRNGKey(0),
        num_inference_steps=args.num_inference_steps,
        num_shift_steps=args.shift_steps,
        input_image=input_image)

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    frames = []
    for k in range(args.shift_steps):
        out = res.outputs[k]
        gt = res.targets[k]
        diff = np.abs(out - gt)
        frames.append(np.concatenate([out, gt, diff], axis=0)[None])
    save_gif_from_tensors(frames, args.output_path, denorm=True)

    for k, p in enumerate(res.psnrs, 1):
        print(f"shift {k}/8 px: masked PSNR {p:.3f} dB")
    print(f"mean shift-equivariance PSNR: {res.mean_psnr:.3f} dB")
    print(f"wrote {args.output_path}")


if __name__ == "__main__":
    main()
