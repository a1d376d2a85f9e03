"""Video editing with the AF-SD backbone + cross-frame attention (ref
scripts/video_editing.py): extract frames, SDEdit-strength editing with the
VideoEquivEditingPipeline, write GIF/mp4."""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--input_video", type=str, default=None,
                   help="video file or directory of frames")
    p.add_argument("--prompt", type=str, default="a video")
    p.add_argument("--n_prompt", type=str, default="")
    p.add_argument("--strength", type=float, default=0.7)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--max_frames", type=int, default=8)
    p.add_argument("--use_inversion", action="store_true")
    p.add_argument("--no_af", action="store_true",
                   help="vanilla (non-alias-free) backbone")
    p.add_argument("--output_path", type=str,
                   default="results/video_edit.gif")
    p.add_argument("--pipeline_dir", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--shard_frames", action="store_true",
                   help="shard the frame axis of the joint denoise over "
                        "all devices (sequence parallelism; frames only "
                        "couple through the replicated frame-0 KV)")
    return p.parse_args()


def load_frames(path, size, max_frames):
    from PIL import Image
    frames = []
    if path and os.path.isdir(path):
        for f in sorted(os.listdir(path))[:max_frames]:
            img = Image.open(os.path.join(path, f)).convert("RGB")
            img = img.resize((size, size), Image.BICUBIC)
            frames.append(np.asarray(img, np.float32) / 127.5 - 1.0)
    elif path:
        try:
            import cv2
            cap = cv2.VideoCapture(path)
            while len(frames) < max_frames:
                ok, frame = cap.read()
                if not ok:
                    break
                frame = cv2.resize(frame[:, :, ::-1], (size, size))
                frames.append(frame.astype(np.float32) / 127.5 - 1.0)
        except ImportError:
            raise SystemExit("cv2 unavailable; pass a frame directory")
    else:
        # synthetic translating pattern
        rng = np.random.default_rng(0)
        low = np.tanh(rng.standard_normal((size // 8, size // 8, 3)))
        base = np.kron(low, np.ones((8, 8, 1)))
        for i in range(max_frames):
            frames.append(np.roll(base, i * 2, axis=1))
    return np.stack(frames).astype(np.float32)


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from afldm_tpu.models import (UNet2DConditionModel,
                                  UNet2DConditionConfig, AutoencoderKL,
                                  AutoencoderKLConfig)
    from afldm_tpu.schedulers import DDIMScheduler
    from afldm_tpu.pipelines import VideoEquivEditingPipeline
    from afldm_tpu.utils.io import save_gif_from_tensors

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vcfg = json.load(open(os.path.join(root,
                                       "configs/vae/model_afvae.json")))
    alias_free = not args.no_af
    if args.tiny:
        ucfg = UNet2DConditionConfig(
            sample_size=8, block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, attention_head_dim=2,
            cross_attention_dim=16, norm_num_groups=8,
            alias_free=alias_free)
        vcfg.update(block_out_channels=[8, 8, 8, 8], layers_per_block=1,
                    norm_num_groups=4,
                    down_filtered_act=[False, True, True, True])
    else:
        ucfg = UNet2DConditionConfig(alias_free=alias_free)
    vae_cfg = AutoencoderKLConfig.from_diffusers(vcfg)
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(vae_cfg)

    key = jax.random.PRNGKey(0)
    res = ucfg.sample_size * vae_cfg.downsample_ratio
    k1, k2 = jax.random.split(key)
    up = jax.jit(unet.init)(k1, jnp.zeros((1, ucfg.sample_size,
                                           ucfg.sample_size, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    vp = jax.jit(vae.init)(k2, jnp.zeros((1, res, res, 3)))

    mesh = None
    if args.shard_frames:
        from afldm_tpu.parallel import create_mesh
        mesh = create_mesh()
    pipe = VideoEquivEditingPipeline(
        vae, vp, unet, up,
        DDIMScheduler(beta_end=0.012, beta_schedule="scaled_linear",
                      beta_start=0.00085, clip_sample=False,
                      num_train_timesteps=1000, set_alpha_to_one=False,
                      steps_offset=1, timestep_spacing="leading"),
        mesh=mesh)

    frames = jnp.asarray(load_frames(args.input_video, res,
                                     args.max_frames))
    out = pipe(frames, args.prompt, args.n_prompt, strength=args.strength,
               num_inference_steps=args.num_inference_steps,
               guidance_scale=args.guidance_scale,
               use_inversion=args.use_inversion,
               key=jax.random.PRNGKey(1))

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    save_gif_from_tensors([out[i:i + 1] * 2 - 1 for i in range(len(out))],
                          args.output_path, denorm=True)
    print(f"edited {len(out)} frames -> {args.output_path}")


if __name__ == "__main__":
    main()
