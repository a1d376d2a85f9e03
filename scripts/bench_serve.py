"""Serving throughput: the persistent sampler service at flagship size.

Measures what a deployment sees from ``afldm_tpu.serve.SamplerService``
wrapping the flagship FFHQ-256 LDM pipeline (274M-param AF UNet denoise +
AF-VAE decode, the workload of scripts/serve_ldm.py): sustained samples/s
and per-request latency for

  - serial:     one client issuing requests back-to-back (bucket-1 path)
  - concurrent: N clients in flight (cross-request microbatching packs
                them into one device dispatch per window)

The reference has no serving story (research scripts only, SURVEY.md §2.9);
this benchmarks the deployment layer the TPU build adds. Results land in
BENCH_NOTES.md via scripts/r4_collect.py.

Timing is honest serving time: every sample() returns decoded images as
host numpy (device->host readback included), so no in-graph-scalar trick
is needed — the bytes on the host ARE the proof of execution.
"""

import argparse
import json
import os
import statistics
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests_per_client", type=int, default=3)
    p.add_argument("--serial_requests", type=int, default=8)
    p.add_argument("--batch_window_ms", type=float, default=30.0)
    p.add_argument("--tiny", action="store_true",
                   help="tiny model + 2-step smoke mode (CPU-runnable)")
    p.add_argument("--out", default=os.path.join(
        REPO, "results", "bench_serve.json"))
    args = p.parse_args()
    if args.tiny:
        args.steps = 2
        args.serial_requests = 2
        args.clients = 2
        args.requests_per_client = 1

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from afldm_tpu.pipelines.loading import init_random_pipeline
    from afldm_tpu.serve import SamplerService

    with open(os.path.join(REPO, "configs/ldm/noise_scheduler.json")) as f:
        sched_cfg = json.load(f)
    from afldm_tpu.models import UNet2DConfig, AutoencoderKLConfig
    if args.tiny:
        unet_cfg = UNet2DConfig(
            sample_size=8, in_channels=4, out_channels=4,
            down_block_types=("DownBlock2D", "DownBlock2D"),
            up_block_types=("UpBlock2D", "UpBlock2D"),
            block_out_channels=(8, 16), layers_per_block=1,
            attention_head_dim=8, norm_num_groups=4, alias_free=True)
        vae_cfg = AutoencoderKLConfig(
            block_out_channels=(8, 8), layers_per_block=1,
            norm_num_groups=4, sample_size=16, scaling_factor=0.6)
    else:
        with open(os.path.join(REPO, "configs/vae/model_afvae.json")) as f:
            vae_cfg = json.load(f)
        unet_cfg = UNet2DConfig(alias_free=True)  # defaults == FFHQ flagship

    t0 = time.time()
    pipe = init_random_pipeline(unet_cfg, vae_cfg, sched_cfg)
    print(f"pipeline built in {time.time() - t0:.1f}s", flush=True)

    svc = SamplerService(pipe, batch_window_ms=args.batch_window_ms,
                         max_batch=8)
    try:
        # warm every bucket the phases can hit (window coalescing lands on
        # 2/4 as well as 8) — one num_images=b request pins each bucket, so
        # all compiles happen here, none mid-measurement
        for b in svc.buckets:
            t0 = time.time()
            svc.sample(b, args.steps, seed=100 + b)
            print(f"bucket-{b} warm in {time.time() - t0:.1f}s", flush=True)

        # -- serial --
        lat = []
        t0 = time.perf_counter()
        for s in range(args.serial_requests):
            r = svc.sample(1, args.steps, seed=s)
            lat.append(r["latency_s"])
        serial_s = time.perf_counter() - t0
        serial_sps = args.serial_requests / serial_s
        serial_p50 = statistics.median(lat)

        # -- concurrent --
        base_batches = svc.stats["batches"]
        n_total = args.clients * args.requests_per_client
        lat2 = []

        def client(cid):
            out = []
            for i in range(args.requests_per_client):
                r = svc.sample(1, args.steps, seed=1000 + cid * 97 + i)
                out.append(r["latency_s"])
            return out

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=args.clients) as ex:
            for res in ex.map(client, range(args.clients)):
                lat2.extend(res)
        conc_s = time.perf_counter() - t0
        conc_sps = n_total / conc_s
        conc_p50 = statistics.median(lat2)
        batches = svc.stats["batches"] - base_batches

        out = {
            "workload": ("tiny-smoke" if args.tiny else "FFHQ-256 AF-LDM")
                        + f" {args.steps}-step denoise + VAE decode, "
                        "per-request num_images=1",
            "steps": args.steps,
            "serial": {"requests": args.serial_requests,
                       "samples_per_s": round(serial_sps, 3),
                       "p50_latency_s": round(serial_p50, 3)},
            "concurrent": {"clients": args.clients,
                           "requests": n_total,
                           "samples_per_s": round(conc_sps, 3),
                           "p50_latency_s": round(conc_p50, 3),
                           "device_batches": batches},
            "microbatching_speedup": round(conc_sps / serial_sps, 3),
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out))
    finally:
        svc.close()


if __name__ == "__main__":
    main()
