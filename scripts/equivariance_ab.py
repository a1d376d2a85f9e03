"""A/B equivariance demonstration (VERDICT r1 item 6): train two tiny LDMs
on the same synthetic data — one naive, one alias-free + shift loss — and
measure the shift-equivariance masked PSNR of each trained model
(scripts/shift_ldm_ffhq.py:131-151 protocol via pipelines.shift_eval).
The AF model must win by a clear margin; the numbers go to BENCH_NOTES.md.

  python scripts/equivariance_ab.py --steps 300 --eval_steps 20
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def train_and_eval(alias_free: bool, steps: int, eval_steps: int,
                   shift_steps: int, seed: int = 0):
    import jax
    from afldm_tpu.train import (BaseTrainingConfig, LDMTrainingConfig,
                                 SyntheticDataset, epoch_batches,
                                 create_trainer)
    from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig
    from afldm_tpu.schedulers import DDIMScheduler
    from afldm_tpu.pipelines import LDMPipeline
    from afldm_tpu.pipelines.shift_eval import shift_equivariance_eval

    vae_cfg = AutoencoderKLConfig(
        block_out_channels=(8, 8), layers_per_block=1, latent_channels=4,
        norm_num_groups=4, sample_size=16, scaling_factor=0.6,
        alias_free=alias_free, down_filtered_act=(False, True),
        up_filtered_act=(True, False), up_rescale=(True,))
    unet_cfg = UNet2DConfig(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("AttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "AttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1,
        attention_head_dim=8, norm_num_groups=8, alias_free=alias_free)
    sched_cfg = dict(num_train_timesteps=100, beta_schedule="scaled_linear",
                     beta_start=0.0015, beta_end=0.0195, clip_sample=False)

    base = BaseTrainingConfig(logging_dir="logs", output_dir="/tmp/eq_ab",
                              resolution=16, train_batch_size=8,
                              num_epochs=1, seed=seed)
    cfg = LDMTrainingConfig(vae_path="", scheduler_path="",
                            af_models=alias_free,
                            use_shift_loss=alias_free,
                            use_cross_attn=True, use_ema=True,
                            learning_rate=2e-3, lr_warmup_steps=0)
    tr = create_trainer("ldm", base, cfg)
    tr.init_modules(vae_config=vae_cfg, unet_config=unet_cfg,
                    scheduler_config=sched_cfg)
    tr.init_optimizers(steps)
    tr.prepare_modules()

    ds = SyntheticDataset(resolution=16, length=256, seed=seed)
    t0 = time.time()
    step = 0
    losses = []
    while step < steps:
        for batch in epoch_batches(ds, base.train_batch_size,
                                   seed=seed + step):
            logs = tr.training_step(step, batch)
            losses.append(logs["train_loss"])
            step += 1
            if step >= steps:
                break
    dt = time.time() - t0

    sched = DDIMScheduler.from_config(tr.noise_scheduler.config)
    params = jax.tree_util.tree_map(lambda x: x, tr.state.ema_params
                                    or tr.state.params)
    pipe = LDMPipeline(tr.vae, tr.vae_params, tr.unet, params, sched,
                       scaling_factor=vae_cfg.scaling_factor)
    res = shift_equivariance_eval(pipe, key=jax.random.PRNGKey(7),
                                  num_inference_steps=eval_steps,
                                  num_shift_steps=shift_steps)
    psnrs = np.asarray(res.psnrs, np.float64)
    d = vae_cfg.downsample_ratio
    # shift k/d pixels, k=1..n: fractional (sub-pixel) shifts are where
    # aliasing shows; integer-pixel shifts are easy for any conv net
    frac = [float(p) for k, p in enumerate(psnrs, 1) if k % d]
    return dict(alias_free=alias_free,
                train_steps=steps,
                train_s=round(dt, 1),
                first_loss=float(np.mean(losses[:5])),
                last_loss=float(np.mean(losses[-5:])),
                mean_masked_psnr=round(res.mean_psnr, 3),
                frac_shift_psnr=round(float(np.mean(frac)), 3) if frac
                else None,
                psnrs=[round(float(p), 2) for p in psnrs])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--eval_steps", type=int, default=20)
    p.add_argument("--shift_steps", type=int, default=8)
    p.add_argument("--out", type=str, default="results/equivariance_ab.json")
    args = p.parse_args()

    results = {}
    for af in (False, True):
        r = train_and_eval(af, args.steps, args.eval_steps,
                           args.shift_steps)
        results["alias_free" if af else "naive"] = r
        print(json.dumps(r))

    gain = (results["alias_free"]["mean_masked_psnr"]
            - results["naive"]["mean_masked_psnr"])
    results["af_psnr_gain_db"] = round(gain, 3)
    fgain = (results["alias_free"]["frac_shift_psnr"]
             - results["naive"]["frac_shift_psnr"])
    results["af_frac_shift_gain_db"] = round(fgain, 3)
    print(f"AF equivariance gain: {gain:+.2f} dB overall, {fgain:+.2f} dB "
          f"on fractional shifts "
          f"(naive {results['naive']['frac_shift_psnr']} dB -> "
          f"AF {results['alias_free']['frac_shift_psnr']} dB)")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
