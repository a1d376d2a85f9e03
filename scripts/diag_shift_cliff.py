"""Diagnose the k=8->9 PSNR cliff in the flagship shift eval (VERDICT r4
weak #7): both arms drop ~3-4 dB for shifts k=9..16 (1..2 latent pixels)
vs k=1..8 (<=1 latent pixel), recovering monotonically toward k=16.

Probe: run the eval's latent-shift -> mask -> decode path through the VAE
ALONE (no UNet, no CFA) on the trained arm. If the per-shift PSNR shows the
same cliff, the cliff is a property of the protocol's latent masking +
decoder bleed (the zeroed wrap band is ceil(k/8) latent pixels = 8*ceil(k/8)
image pixels, while the image-space mask only excludes k pixels, so
8*ceil(k/8) - k scored pixels decode from zeroed latents), not of the
denoiser or cross-frame attention.

CPU-friendly (one decode of 16 shifts, chunked):
  env PYTHONPATH= JAX_PLATFORMS=cpu /opt/venv/bin/python \
      scripts/diag_shift_cliff.py --arm af
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
ROOT = os.path.join(REPO, "results", "flagship_ab")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arm", choices=["naive", "af"], default="af")
    p.add_argument("--shift_steps", type=int, default=16)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--chunk", type=int, default=4)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    from afldm_tpu.pipelines.loading import load_pipeline
    from afldm_tpu.shift.shifters import ImageShifter
    from afldm_tpu.shift.metrics import mask_psnr

    pipe = load_pipeline(os.path.join(ROOT, args.arm, "ldm", "pipeline"),
                         use_ema=True)
    d = pipe.vae.config.downsample_ratio
    n_sh = args.shift_steps

    latent_shifter = ImageShifter("ideal_crop", upsample_ratio=d)
    image_shifter = ImageShifter()  # bilinear (the eval's GT path)

    # the same init distribution as the eval, pushed through the VAE alone:
    # z = encode(decode(noise-latent)) would be circular; instead use the
    # reconstruction latent of a dataset image (the content the arms were
    # trained on)
    from afldm_tpu.train.data import ImageFolderDataset
    ds = ImageFolderDataset(os.path.join(ROOT, "data", "valid"),
                            resolution=256, random_flip=False)
    img = jnp.asarray(ds[0]["input"])[None]          # (1, 256, 256, 3)

    @jax.jit
    def encode_mode(x):
        mean, _ = pipe.vae.apply(pipe.vae_params, x, method="encode")
        return mean

    z = encode_mode(img)

    @jax.jit
    def prep(lat):
        c = latent_shifter.precompute(lat)
        sh, ms = [], []
        for k in range(1, n_sh + 1):
            s, m = latent_shifter.shift(lat, 0.0, k / d, cache=c)
            sh.append(s)
            ms.append(m)
        return jnp.concatenate(sh, 0), jnp.concatenate(ms, 0)

    decode = jax.jit(lambda zz: pipe.vae.apply(pipe.vae_params, zz,
                                               method="decode"))

    rec = decode(z)
    shifted, lat_masks = prep(z)
    masked = shifted * lat_masks
    outs = jnp.concatenate(
        [decode(masked[i:i + args.chunk])
         for i in range(0, n_sh, args.chunk)], axis=0)

    @jax.jit
    def score(rec_img, outputs):
        psnrs = []
        for k in range(1, n_sh + 1):
            gt, m = image_shifter.shift(rec_img, 0.0, float(k))
            psnrs.append(mask_psnr(outputs[k - 1:k], gt, m))
        return jnp.stack(psnrs)

    psnrs = np.asarray(score(rec, outs), np.float64)
    frac = [float(v) for k, v in enumerate(psnrs, 1) if k % d]
    out = {
        "arm": args.arm, "probe": "vae_only (no UNet/CFA)",
        "psnrs": [round(float(v), 2) for v in psnrs],
        "k1_8_mean": round(float(psnrs[:8].mean()), 3),
        "k9_16_mean": round(float(psnrs[8:].mean()), 3),
        "cliff_db": round(float(psnrs[:8].mean() - psnrs[8:].mean()), 3),
        "frac_mean": round(float(np.mean(frac)), 3),
        "_note": ("if cliff_db here matches the full eval's ~2-4 dB, the "
                  "k=8->9 cliff is the protocol's latent mask/decoder "
                  "bleed (8*ceil(k/8)-k scored pixels decode from zeroed "
                  "latents), not a denoiser/CFA property"),
    }
    print(json.dumps(out, indent=2))
    path = args.out or os.path.join(ROOT, args.arm,
                                    "diag_shift_cliff.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
