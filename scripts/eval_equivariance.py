"""StyleGAN-3 EQ metrics runner — the reference ships
compute_equivariance_metrics but never invokes it (SURVEY.md §4 item 3);
this CLI wires it to the AF-LDM generator: generate(z | transform) =
decode(denoise(T z)) with CFA pinned, measuring EQ-T / EQ-T_frac over the
latent-shift operator.

example:
  python scripts/eval_equivariance.py --tiny --num_samples 4 --steps 2
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num_samples", type=int, default=8)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--translate_max", type=float, default=0.125)
    p.add_argument("--pipeline_dir", type=str, default=None)
    p.add_argument("--use_ema", action="store_true",
                   help="load EMA weights (match the flagship eval)")
    p.add_argument("--out", type=str, default=None,
                   help="write the metrics as JSON")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from afldm_tpu.pipelines.loading import (load_pipeline,
                                             init_random_pipeline)
    from afldm_tpu.shift.equivariance import compute_equivariance_metrics
    from afldm_tpu.shift.shifters import ImageShifter

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.pipeline_dir:
        pipe = load_pipeline(args.pipeline_dir, use_ema=args.use_ema)
    else:
        ucfg = json.load(open(os.path.join(root,
                                           "configs/ldm/model_unet.json")))
        vcfg = json.load(open(os.path.join(root,
                                           "configs/vae/model_afvae.json")))
        scfg = json.load(open(os.path.join(
            root, "configs/ldm/noise_scheduler.json")))
        if args.tiny:
            ucfg.update(sample_size=8, block_out_channels=[32, 64],
                        down_block_types=["AttnDownBlock2D", "DownBlock2D"],
                        up_block_types=["UpBlock2D", "AttnUpBlock2D"],
                        layers_per_block=1, attention_head_dim=8,
                        norm_num_groups=8)
            vcfg.update(block_out_channels=[16, 16, 16, 16],
                        layers_per_block=1, norm_num_groups=8,
                        down_filtered_act=[False, True, True, True])
        pipe = init_random_pipeline(ucfg, vcfg, scfg)

    ratio = pipe.vae.config.downsample_ratio
    sample = pipe.unet.config.sample_size
    img_res = sample * ratio
    shifter = ImageShifter("ideal", upsample_ratio=ratio)

    kv_store = {}
    shift_jit = jax.jit(lambda z, ti, tj: shifter.shift(z, ti, tj)[0])

    def generate(key, M):
        """M is the 3x3 input transform: translation (M[0,2], M[1,2]) in
        fractions of the image, applied to the initial latent."""
        z = jax.random.normal(key, (args.batch_size, sample, sample, 4),
                              jnp.float32)
        tx = -float(M[0, 2]) * sample  # latent pixels
        ty = -float(M[1, 2]) * sample
        try:
            kid = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
        except Exception:
            kid = int(np.asarray(key).ravel()[-1])
        if (tx, ty) != (0.0, 0.0):
            z = shift_jit(z, jnp.float32(ty), jnp.float32(tx))
            kv = kv_store.get(kid)
            lat, _ = pipe.denoise(z, args.steps, kv_traj=kv)
        else:
            lat, kv = pipe.denoise(z, args.steps, collect_kv=True)
            kv_store[kid] = kv
        return pipe.decode(lat)

    psnrs = compute_equivariance_metrics(
        generate, jax.random.PRNGKey(0), args.num_samples, args.batch_size,
        img_res, translate_max=args.translate_max,
        compute_eqt_int=True, compute_eqt_frac=True)
    print(f"EQ-T: {psnrs[0]:.3f} dB  EQ-T_frac: {psnrs[1]:.3f} dB")
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump({"eq_t_db": round(float(psnrs[0]), 3),
                       "eq_t_frac_db": round(float(psnrs[1]), 3),
                       "num_samples": args.num_samples,
                       "steps": args.steps,
                       "translate_max": args.translate_max,
                       "use_ema": args.use_ema,
                       "pipeline_dir": args.pipeline_dir}, f, indent=2)


if __name__ == "__main__":
    main()
