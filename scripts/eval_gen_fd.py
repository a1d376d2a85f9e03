"""Generation-quality Frechet distance for the flagship A/B arms.

The reference's equivariance story is paired with a "the AF surgery does
not cost sample quality" claim (its FID tables come from the StyleGAN-3
metric stack whose accumulator is af_libs/metric_utils.py:79-158). This
script is the live TPU-side consumer of utils/metric_utils.py: it
accumulates FeatureStats over (a) the training dataset and (b) fresh
pipeline samples, and reports frechet_distance between them.

Inception weights are egress-blocked (CLAUDE.md), so three banks stand in:
(a) model-independent average-pooled pixels (default 8x8x3 = 192 dims),
(b) the fixed random multi-scale conv bank from train/perceptual.py
(seeded, identical for both arms; LPIPS-style unit-normed stage features,
4x4 spatial pooling -> 896 dims — the perceptual proxy VERDICT r4 item 3
asked for), and (c) the arm's OWN VAE latent statistics (within-arm only:
the two arms have different encoders). (a) and (b) are deterministic and
shared across arms, hence cross-arm comparable.

  python scripts/eval_gen_fd.py --arm naive
  python scripts/eval_gen_fd.py --arm af
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
    p.add_argument("--pipeline_dir", type=str, default=None)
    p.add_argument("--data_dir", type=str,
                   default=os.path.join(ROOT, "data", "train"))
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--num_samples", type=int, default=128)
    p.add_argument("--num_real", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--pool", type=int, default=8,
                   help="pixel features are avg-pooled to (pool, pool, 3)")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--seed", type=int, default=11)
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"])
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from afldm_tpu.pipelines.loading import load_pipeline
    from afldm_tpu.train.data import ImageFolderDataset
    from afldm_tpu.train.perceptual import pooled_feature_vector
    from afldm_tpu.utils.metric_utils import (FeatureStats, ProgressMonitor,
                                              frechet_distance)

    pipe_dir = args.pipeline_dir or os.path.join(
        ROOT, args.arm, "ldm", "pipeline")
    pipe = load_pipeline(pipe_dir, use_ema=True)

    pool = args.pool

    @jax.jit
    def pixel_features(img01):
        """(N, H, W, 3) in [0,1] -> (N, pool*pool*3) average-pooled."""
        n, h, w, c = img01.shape
        x = img01.reshape(n, pool, h // pool, pool, w // pool, c)
        return x.mean(axis=(2, 4)).reshape(n, pool * pool * 3)

    @jax.jit
    def rvgg_features(img_m11):
        """(N, H, W, 3) in [-1,1] -> unit-normed random multi-scale conv
        features, 4x4 spatial pooling per stage, concatenated (896 dims)."""
        return pooled_feature_vector(img_m11)

    @jax.jit
    def latent_features(img_m11):
        """(N, H, W, 3) in [-1,1] -> pooled VAE posterior-mean latents."""
        z = pipe.encode(img_m11)          # (N, h, w, 4), mode (no key)
        n, h, w, c = z.shape
        lp = min(pool, h)
        x = z.reshape(n, lp, h // lp, lp, w // lp, c)
        return x.mean(axis=(2, 4)).reshape(n, lp * lp * c)

    def add(stats, img01, monitor, done):
        img01 = jnp.asarray(img01, jnp.float32)
        m11 = img01 * 2.0 - 1.0
        stats["px"].append(np.asarray(pixel_features(img01)))
        stats["rvgg"].append(np.asarray(rvgg_features(m11)))
        stats["lat"].append(np.asarray(latent_features(m11)))
        monitor.update(done)

    def make_stats(max_items):
        return {k: FeatureStats(capture_mean_cov=True, max_items=max_items)
                for k in ("px", "rvgg", "lat")}

    # ---- real-data statistics ----
    ds = ImageFolderDataset(args.data_dir, resolution=args.resolution)
    n_real = min(args.num_real, len(ds))
    real = make_stats(n_real)
    mon = ProgressMonitor(tag="real", num_items=n_real,
                          flush_interval=args.batch * 4)
    for start in range(0, n_real, args.batch):
        idx = range(start, min(start + args.batch, n_real))
        batch = np.stack([ds[i]["input"] for i in idx])   # [-1,1]
        add(real, (batch + 1.0) / 2.0, mon, start + len(batch))

    # ---- generated-sample statistics ----
    gen = make_stats(args.num_samples)
    mon = ProgressMonitor(tag="samples", num_items=args.num_samples,
                          flush_interval=args.batch)
    key = jax.random.PRNGKey(args.seed)
    done = 0
    while done < args.num_samples:
        key, k = jax.random.split(key)
        n = min(args.batch, args.num_samples - done)
        img01 = pipe(batch_size=n, key=k,
                     num_inference_steps=args.steps, output_type="np")
        done += n
        add(gen, img01, mon, done)

    out = {
        "arm": args.arm, "pipeline_dir": pipe_dir,
        "num_real": n_real, "num_samples": args.num_samples,
        "steps": args.steps, "resolution": args.resolution,
        "fd_pixel_pool": round(frechet_distance(real["px"], gen["px"]), 5),
        "fd_rvgg": round(frechet_distance(real["rvgg"], gen["rvgg"]), 5),
        "fd_vae_latent": round(frechet_distance(real["lat"], gen["lat"]), 5),
        "pixel_feature_dim": pool * pool * 3,
        "rvgg_feature_dim": int(real["rvgg"].num_features or 0),
        "_note": ("fd_pixel_pool (avg-pooled pixels) and fd_rvgg (fixed "
                  "random multi-scale conv bank, train/perceptual.py) are "
                  "model-independent and cross-arm comparable; Inception "
                  "is egress-blocked. fd_vae_latent uses the arm's own VAE "
                  "encoder (within-arm tracking only)."),
    }
    print(json.dumps(out, indent=2))
    path = args.out or os.path.join(ROOT, args.arm, "gen_fd.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
