"""Image interpolation via flow-warped noise + CFA blending (ref
scripts/image_interpolation.py). The reference downloads a GMFlow
checkpoint (HTTP); here the flow comes from the built-in pyramidal
estimator (afldm_tpu.shift.simple_flow) or precomputed .npy flows.

NOTE: the reference passes ``enable_morph=True`` which its pipeline
silently ignores (SURVEY.md §2.12 item 4); interpolation here is on by
default."""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--img0", type=str, default=None)
    p.add_argument("--img1", type=str, default=None)
    p.add_argument("--num_frames", type=int, default=17)
    p.add_argument("--num_inference_steps", type=int, default=50)
    p.add_argument("--output_path", type=str,
                   default="results/interpolation.gif")
    p.add_argument("--flow_npz", type=str, default=None,
                   help=".npz with fwd_flow/fwd_occ/bwd_flow/bwd_occ")
    p.add_argument("--gmflow_ckpt", type=str, default=None,
                   help="local gmflow_sintel-*.pth checkpoint; uses the "
                        "GMFlow port instead of the built-in LK flow")
    p.add_argument("--no_slerp", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--shard_frames", action="store_true",
                   help="shard the frame axis of the joint interp denoise "
                        "over all devices (frames only couple through the "
                        "two replicated endpoint KV trajectories)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    from afldm_tpu.models import (UNet2DConditionModel,
                                  UNet2DConditionConfig, AutoencoderKL,
                                  AutoencoderKLConfig)
    from afldm_tpu.schedulers import DDIMScheduler
    from afldm_tpu.pipelines import ImageInterpolationPipeline
    from afldm_tpu.shift.simple_flow import predict_flow
    from afldm_tpu.utils.io import image_to_tensor, save_gif_from_tensors

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vcfg = json.load(open(os.path.join(root,
                                       "configs/vae/model_afvae.json")))
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
    res = ucfg.sample_size * vae_cfg.downsample_ratio

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    up = jax.jit(unet.init)(k1, jnp.zeros((1, ucfg.sample_size,
                                           ucfg.sample_size, 4)),
                            jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, 77, ucfg.cross_attention_dim)))
    vp = jax.jit(vae.init)(k2, jnp.zeros((1, res, res, 3)))

    if args.img0 and args.img1:
        img0 = jnp.asarray(image_to_tensor(args.img0, (res, res)))
        img1 = jnp.asarray(image_to_tensor(args.img1, (res, res)))
    else:
        rng = np.random.default_rng(0)
        low = np.tanh(rng.standard_normal((res // 8, res // 8, 3)))
        base = np.kron(low, np.ones((8, 8, 1)))
        img0 = jnp.asarray(base[None], jnp.float32)
        img1 = jnp.asarray(np.roll(base, res // 8, axis=1)[None],
                           jnp.float32)

    if args.flow_npz:
        z = np.load(args.flow_npz)
        flows = tuple(jnp.asarray(z[k]) for k in
                      ("fwd_flow", "fwd_occ", "bwd_flow", "bwd_occ"))
    elif args.gmflow_ckpt:
        # the reference's flow source (image_interpolation_pipeline.py:178)
        from afldm_tpu.models.gmflow import (GMFlow, GMFlowConfig,
                                             load_gmflow_checkpoint,
                                             make_gmflow_flow_fn)
        gcfg = GMFlowConfig()
        gm = GMFlow(gcfg)
        gparams = jax.jit(gm.init)(jax.random.PRNGKey(3),
                                   jnp.zeros((1, res, res, 3)),
                                   jnp.zeros((1, res, res, 3)))
        gparams, report = load_gmflow_checkpoint(args.gmflow_ckpt, gparams)
        if report["unfilled_flax_leaves"]:
            print("WARNING: gmflow leaves not filled:",
                  report["unfilled_flax_leaves"][:5])
        flows = make_gmflow_flow_fn(gparams, gcfg)(img0, img1)
    else:
        flows = predict_flow(img0, img1)

    mesh = None
    if args.shard_frames:
        from afldm_tpu.parallel import create_mesh
        mesh = create_mesh()
    pipe = ImageInterpolationPipeline(
        vae, vp, unet, up,
        DDIMScheduler(beta_end=0.012, beta_schedule="scaled_linear",
                      beta_start=0.00085, clip_sample=False,
                      num_train_timesteps=1000, set_alpha_to_one=False,
                      steps_offset=1, timestep_spacing="leading"),
        mesh=mesh)

    out = pipe(img0, img1, num_frames=args.num_frames,
               num_inference_steps=args.num_inference_steps,
               key=jax.random.PRNGKey(1), flows=flows,
               use_slerp=not args.no_slerp)

    os.makedirs(os.path.dirname(args.output_path) or ".", exist_ok=True)
    save_gif_from_tensors([out[i:i + 1] * 2 - 1 for i in range(len(out))],
                          args.output_path, denorm=True)
    print(f"interpolated {len(out)} frames -> {args.output_path}")


if __name__ == "__main__":
    main()
