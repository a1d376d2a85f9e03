"""End-to-end SD-pipeline throughput on the real TPU at production size
(random weights — model-shape-true performance, not output quality):

- video editing (video_editing.sh workload): N frames at RES px, SDEdit
  strength 0.7, frame-0 CFA, CFG batch 2 per frame.
- image interpolation (image_interpolation.sh workload): M interpolated
  frames, DDIM inversion of both endpoints + joint CFA-interp denoise,
  LK optical flow.
- I2SB latent SR (shift_ldm_sr.sh workload): 4x bicubic degrade +
  ODE bridge denoise, FFHQ-size models at 256 px.
- normal estimation (shift_normal_estimation.sh workload): YOSO
  single-step ControlNet over the full 16-shift sweep in one batch.

Reports frames/s end-to-end (encode -> denoise -> decode). First compile
of each phase graph is slow through the remote-compile service; the
persistent cache makes reruns fast.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--interp_frames", type=int, default=5)
    p.add_argument("--skip_video", action="store_true")
    p.add_argument("--skip_interp", action="store_true")
    p.add_argument("--skip_sr", action="store_true")
    p.add_argument("--skip_normal", action="store_true")
    p.add_argument("--attn", default="auto", choices=["auto", "xla"])
    args = p.parse_args()

    import jax
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    from afldm_tpu.models import (UNet2DConditionModel, UNet2DConditionConfig,
                                  AutoencoderKL, AutoencoderKLConfig)
    from afldm_tpu.schedulers import DDIMScheduler
    from afldm_tpu.ops.attention import set_attention_impl
    from afldm_tpu.pipelines.video_editing import VideoEquivEditingPipeline
    from afldm_tpu.pipelines.interpolation import ImageInterpolationPipeline
    from afldm_tpu.shift.simple_flow import predict_flow as lk_predict_flow

    set_attention_impl(args.attn)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    vcfg_json = json.load(open(os.path.join(root,
                                            "configs/vae/model_afvae.json")))
    ucfg = UNet2DConditionConfig(alias_free=True,
                                 sample_size=args.resolution // 8)
    vcfg = AutoencoderKLConfig.from_diffusers(vcfg_json)
    unet = UNet2DConditionModel(ucfg)
    vae = AutoencoderKL(vcfg)

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    ls = ucfg.sample_size
    lat = jnp.zeros((1, ls, ls, 4), jnp.float32)
    ehs = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.float32)
    print("initializing params...", file=sys.stderr)
    up = jax.jit(unet.init)(k1, lat, jnp.zeros((1,), jnp.int32), ehs)
    vp = jax.jit(vae.init)(k2, jnp.zeros((1, args.resolution,
                                          args.resolution, 3), jnp.float32))
    sched = DDIMScheduler(beta_end=0.012, beta_schedule="scaled_linear",
                          beta_start=0.00085, clip_sample=False,
                          num_train_timesteps=1000, set_alpha_to_one=False,
                          steps_offset=1, timestep_spacing="leading")

    rng = np.random.default_rng(0)
    results = {"resolution": args.resolution, "steps": args.steps,
               "attn": args.attn}

    if not args.skip_video:
        ve = VideoEquivEditingPipeline(vae, vp, unet, up, sched)
        frames = jnp.asarray(np.stack(
            [np.roll(rng.standard_normal(
                (args.resolution, args.resolution, 3)) * 0.3, 3 * i, axis=1)
             for i in range(args.frames)]), jnp.float32)
        t0 = time.perf_counter()
        out = ve(frames, "a photo", strength=0.7,
                 num_inference_steps=args.steps,
                 key=jax.random.PRNGKey(1))
        out = np.asarray(out)   # materialize
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(ve(frames, "a photo", strength=0.7,
                            num_inference_steps=args.steps,
                            key=jax.random.PRNGKey(1)))
        dt = time.perf_counter() - t0
        results["video_editing"] = {
            "frames": args.frames, "first_call_s": round(compile_s, 1),
            "seconds": round(dt, 3),
            "frames_per_s": round(args.frames / dt, 3),
            "finite": bool(np.isfinite(out).all())}
        print("video:", results["video_editing"], file=sys.stderr)

    if not args.skip_interp:
        pipe = ImageInterpolationPipeline(vae, vp, unet, up, sched,
                                          flow_fn=lk_predict_flow)
        img0 = jnp.asarray(rng.standard_normal(
            (1, args.resolution, args.resolution, 3)) * 0.3, jnp.float32)
        img1 = jnp.roll(img0, args.resolution // 16, axis=2)
        t0 = time.perf_counter()
        out = np.asarray(pipe(img0, img1, num_frames=args.interp_frames,
                              num_inference_steps=args.steps,
                              key=jax.random.PRNGKey(2)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(pipe(img0, img1, num_frames=args.interp_frames,
                              num_inference_steps=args.steps,
                              key=jax.random.PRNGKey(2)))
        dt = time.perf_counter() - t0
        results["interpolation"] = {
            "frames": args.interp_frames,
            "first_call_s": round(compile_s, 1), "seconds": round(dt, 3),
            "frames_per_s": round(args.interp_frames / dt, 3),
            "finite": bool(np.isfinite(out).all())}
        print("interp:", results["interpolation"], file=sys.stderr)

    if not args.skip_sr:
        from afldm_tpu.models import UNet2DModel, UNet2DConfig
        from afldm_tpu.schedulers import I2SBScheduler
        from afldm_tpu.pipelines.i2sb import I2SBLDMPipeline
        from afldm_tpu.ops.superresolution import build_sr4x

        i2sb_cfg = json.load(open(os.path.join(
            root, "configs/sr/i2sb_scheduler.json")))
        ffhq_unet = UNet2DModel(UNet2DConfig(alias_free=True))
        k3 = jax.random.PRNGKey(1)
        up2 = jax.jit(ffhq_unet.init)(k3, jnp.zeros((1, 32, 32, 4)),
                                      jnp.zeros((1,), jnp.int32))
        # the VAE is fully convolutional — reuse the 512px-initialized
        # params at 256px instead of a second identical init
        sr_pipe = I2SBLDMPipeline(vae, vp, ffhq_unet, up2,
                                  I2SBScheduler.from_config(i2sb_cfg))
        degrade = build_sr4x("bicubic", 256)
        hq = jnp.asarray(rng.standard_normal((1, 256, 256, 3)) * 0.3,
                         jnp.float32)
        lq = jax.jit(degrade)(hq)
        t0 = time.perf_counter()
        out = np.asarray(sr_pipe(lq, num_inference_steps=args.steps))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = np.asarray(sr_pipe(lq, num_inference_steps=args.steps))
        dt = time.perf_counter() - t0
        results["i2sb_sr"] = {
            "first_call_s": round(compile_s, 1), "seconds": round(dt, 3),
            "images_per_s": round(1 / dt, 3),
            "finite": bool(np.isfinite(out).all())}
        print("sr:", results["i2sb_sr"], file=sys.stderr)

    if not args.skip_normal:
        from afldm_tpu.models import ControlNetModel, ControlNetConfig
        from afldm_tpu.pipelines.normal_control import NormControlPipeline

        cn = ControlNetModel(ControlNetConfig.from_unet_config(ucfg))
        cnp = jax.jit(cn.init)(jax.random.PRNGKey(2), lat,
                               jnp.zeros((1,), jnp.int32), ehs, lat)
        norm_pipe = NormControlPipeline(
            vae, vp, unet, up, cn, cnp,
            DDIMScheduler(num_train_timesteps=1000))
        img = jnp.asarray(rng.standard_normal(
            (1, args.resolution, args.resolution, 3)) * 0.3, jnp.float32)
        t0 = time.perf_counter()
        res = norm_pipe(img, num_shift_steps=16)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        res = norm_pipe(img, num_shift_steps=16)
        dt = time.perf_counter() - t0
        results["normal_yoso_sweep"] = {
            "shift_steps": 16,
            "first_call_s": round(compile_s, 1), "seconds": round(dt, 3),
            "estimates_per_s": round(17 / dt, 3),
            "finite": bool(np.isfinite(res.mean_psnr))}
        print("normal:", results["normal_yoso_sweep"], file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
