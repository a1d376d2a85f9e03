"""Run all five acceptance configs (BASELINE.json `configs`) end-to-end and
write a JSON summary. With --pipeline_dir arguments pointing at trained /
converted checkpoints this produces the headline parity table; without
them it runs the full plumbing on random weights (tiny or full-size).

  python scripts/run_all_benchmarks.py --tiny --steps 2 --shift_steps 2
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--shift_steps", type=int, default=16)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--out", type=str, default="results/benchmarks.json")
    p.add_argument("--ldm_pipeline_dir", type=str, default=None)
    p.add_argument("--sr_pipeline_dir", type=str, default=None)
    p.add_argument("--sd_pipeline_dir", type=str, default=None,
                   help="converted SD pipeline dir (conditional unet + vae "
                        "+ optional controlnet/text_encoder) for the "
                        "normal/video/interpolation configs")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force a backend (CPU smokes must not queue work "
                        "on a TPU that may be mid-benchmark)")
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    from afldm_tpu.models import (UNet2DConditionConfig,
                                  UNet2DConditionModel, ControlNetModel,
                                  ControlNetConfig, AutoencoderKL,
                                  AutoencoderKLConfig)
    from afldm_tpu.schedulers import DDIMScheduler, I2SBScheduler
    from afldm_tpu.pipelines import (shift_equivariance_eval,
                                     I2SBLDMPipeline, NormControlPipeline,
                                     VideoEquivEditingPipeline,
                                     ImageInterpolationPipeline)
    from afldm_tpu.pipelines.loading import (load_pipeline,
                                             init_random_pipeline)
    from afldm_tpu.shift.simple_flow import predict_flow
    from afldm_tpu.train.i2sb_trainer import degrade_sr4x

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def _prov(d):
        """'converted' (marker written by convert_reference_checkpoint),
        'trained' (trainer save_pipeline dir), or 'random'."""
        if not d:
            return "random"
        m = os.path.join(d, "provenance.json")
        if os.path.exists(m):
            return json.load(open(m)).get("provenance", "converted")
        return "trained"

    results = {"_provenance": {
        # PSNR numbers below are parity evidence ONLY when weights are
        # 'trained'/'converted'; 'random' means plumbing-on-random-weights
        # (VERDICT r2 weak #3 — never mistake those for acceptance metrics)
        "ffhq_shift": _prov(args.ldm_pipeline_dir),
        "i2sb_sr_shift": _prov(args.sr_pipeline_dir),
        "normal_shift": _prov(args.sd_pipeline_dir),
        "video_editing": _prov(args.sd_pipeline_dir),
        "interpolation": _prov(args.sd_pipeline_dir),
    }}
    t_start = time.time()

    def record(name, **kw):
        kw["seconds"] = round(time.time() - t_start, 1)
        kw["weights"] = results["_provenance"].get(name, "random")
        results[name] = kw
        print(f"[{kw['seconds']:7.1f}s] {name}: "
              f"{ {k: v for k, v in kw.items() if k != 'seconds'} }")

    # shared configs
    ucfg = json.load(open(os.path.join(root, "configs/ldm/model_unet.json")))
    vcfg = json.load(open(os.path.join(root,
                                       "configs/vae/model_afvae.json")))
    scfg = json.load(open(os.path.join(root,
                                       "configs/ldm/noise_scheduler.json")))
    i2sb_cfg = json.load(open(os.path.join(root,
                                           "configs/sr/i2sb_scheduler.json")))
    if args.tiny:
        ucfg.update(sample_size=8, block_out_channels=[32, 64],
                    down_block_types=["AttnDownBlock2D", "DownBlock2D"],
                    up_block_types=["UpBlock2D", "AttnUpBlock2D"],
                    layers_per_block=1, attention_head_dim=8,
                    norm_num_groups=8)
        vcfg.update(block_out_channels=[16, 16, 16, 16], layers_per_block=1,
                    norm_num_groups=8,
                    down_filtered_act=[False, True, True, True])

    # 1. FFHQ-256 unconditional shift (shift_ldm_ffhq.sh)
    pipe = (load_pipeline(args.ldm_pipeline_dir)
            if args.ldm_pipeline_dir
            else init_random_pipeline(ucfg, vcfg, scfg))
    res = shift_equivariance_eval(pipe, key=jax.random.PRNGKey(0),
                                  num_inference_steps=args.steps,
                                  num_shift_steps=args.shift_steps)
    record("ffhq_shift", mean_psnr=round(res.mean_psnr, 3),
           psnrs=[round(float(v), 3) for v in res.psnrs])

    # 2. latent-I2SB SR shift (shift_ldm_sr.sh) — fixed degradation
    sr_pipe = (load_pipeline(args.sr_pipeline_dir, cls=I2SBLDMPipeline,
                             scheduler_config=i2sb_cfg)
               if args.sr_pipeline_dir
               else init_random_pipeline(ucfg, vcfg, i2sb_cfg,
                                         cls=I2SBLDMPipeline))
    img_res = (sr_pipe.unet.config.sample_size
               * sr_pipe.vae.config.downsample_ratio)
    rng = np.random.default_rng(0)
    low = np.tanh(rng.standard_normal((img_res // 8, img_res // 8, 3)))
    img = jnp.asarray(np.kron(low, np.ones((8, 8, 1)))[None], jnp.float32)
    lq = jax.jit(degrade_sr4x)(img)
    init_latent = sr_pipe.encode(lq)
    res = shift_equivariance_eval(sr_pipe, num_inference_steps=args.steps,
                                  num_shift_steps=args.shift_steps,
                                  init_latent=init_latent)
    record("i2sb_sr_shift", mean_psnr=round(res.mean_psnr, 3))

    # 3. normal-estimation shift (shift_normal_estimation.sh)
    text_encoder = None
    if args.sd_pipeline_dir:
        from afldm_tpu.pipelines.loading import load_sd_components
        parts = load_sd_components(args.sd_pipeline_dir)
        sd_unet, sd_up = parts["unet"], parts["unet_params"]
        sd_vae, sd_vp = parts["vae"], parts["vae_params"]
        sd_cfg, vae_cfg = sd_unet.config, sd_vae.config
        text_encoder = parts.get("text_encoder")
        if "controlnet" in parts:
            cn, cn_p = parts["controlnet"], parts["controlnet_params"]
        else:  # converted SD dir without a controlnet: random CN plumbing
            cn = ControlNetModel(ControlNetConfig.from_unet_config(sd_cfg))
            lat = jnp.zeros((1, sd_cfg.sample_size, sd_cfg.sample_size, 4))
            ehs = jnp.zeros((1, 77, sd_cfg.cross_attention_dim))
            cn_p = jax.jit(cn.init)(jax.random.PRNGKey(2), lat,
                                    jnp.zeros((1,), jnp.int32), ehs, lat)
            results["_provenance"]["normal_shift"] = "random"
        sres = sd_cfg.sample_size * vae_cfg.downsample_ratio
    else:
        sd_cfg = (UNet2DConditionConfig(
            sample_size=8, block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
            layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
            norm_num_groups=8, alias_free=True) if args.tiny
            else UNet2DConditionConfig(alias_free=True))
        vae_cfg = AutoencoderKLConfig.from_diffusers(vcfg)
        sd_unet = UNet2DConditionModel(sd_cfg)
        sd_vae = AutoencoderKL(vae_cfg)
        cn = ControlNetModel(ControlNetConfig.from_unet_config(sd_cfg))
        key = jax.random.PRNGKey(0)
        sres = sd_cfg.sample_size * vae_cfg.downsample_ratio
        lat = jnp.zeros((1, sd_cfg.sample_size, sd_cfg.sample_size, 4))
        ehs = jnp.zeros((1, 77, sd_cfg.cross_attention_dim))
        k1, k2, k3 = jax.random.split(key, 3)
        sd_up = jax.jit(sd_unet.init)(k1, lat, jnp.zeros((1,), jnp.int32),
                                      ehs)
        sd_vp = jax.jit(sd_vae.init)(k2, jnp.zeros((1, sres, sres, 3)))
        cn_p = jax.jit(cn.init)(k3, lat, jnp.zeros((1,), jnp.int32), ehs,
                                lat)
    norm_pipe = NormControlPipeline(sd_vae, sd_vp, sd_unet, sd_up, cn, cn_p,
                                    DDIMScheduler(num_train_timesteps=1000),
                                    text_encoder=text_encoder)
    low = np.tanh(rng.standard_normal((sres // 8, sres // 8, 3)))
    nimg = jnp.asarray(np.kron(low, np.ones((8, 8, 1)))[None], jnp.float32)
    nres = norm_pipe(nimg, num_shift_steps=args.shift_steps)
    record("normal_shift", mean_psnr=round(nres.mean_psnr, 3))

    # 4. video editing (video_editing.sh)
    ve = VideoEquivEditingPipeline(
        sd_vae, sd_vp, sd_unet, sd_up,
        DDIMScheduler(beta_end=0.012, beta_schedule="scaled_linear",
                      beta_start=0.00085, clip_sample=False,
                      num_train_timesteps=1000, set_alpha_to_one=False,
                      steps_offset=1, timestep_spacing="leading"),
        text_encoder=text_encoder)
    frames = jnp.asarray(np.stack(
        [np.roll(np.asarray(nimg)[0], 2 * i, axis=1)
         for i in range(args.frames)]), jnp.float32)
    out = ve(frames, "a clip", strength=0.6,
             num_inference_steps=max(args.steps // 10, 2),
             guidance_scale=2.0, key=jax.random.PRNGKey(1))
    record("video_editing", frames=int(out.shape[0]),
           finite=bool(np.isfinite(out).all()))

    # 5. image interpolation with flow-warped noise (image_interpolation.sh)
    interp = ImageInterpolationPipeline(
        sd_vae, sd_vp, sd_unet, sd_up,
        DDIMScheduler(beta_end=0.012, beta_schedule="scaled_linear",
                      beta_start=0.00085, clip_sample=False,
                      num_train_timesteps=1000, set_alpha_to_one=False,
                      steps_offset=1, timestep_spacing="leading"),
        text_encoder=text_encoder)
    img1 = jnp.roll(nimg, sres // 8, axis=2)
    flows = predict_flow(nimg, img1)
    out = interp(nimg, img1, num_frames=3,
                 num_inference_steps=max(args.steps // 10, 2),
                 key=jax.random.PRNGKey(2), flows=flows)
    record("interpolation", frames=int(out.shape[0]),
           finite=bool(np.isfinite(out).all()))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    # merge: r4_collect.py maintains sibling keys (flagship_ab_256px,
    # flagship_gen_fd) in the same file — never clobber them
    merged = {}
    try:
        with open(args.out) as f:
            merged = json.load(f)
    except (FileNotFoundError, ValueError):
        pass
    merged.update(results)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
