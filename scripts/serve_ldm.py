"""Run the persistent sampler service on a trained (or random) LDM
pipeline.

  python scripts/serve_ldm.py --pipeline_dir train_ckpt/.../pipeline \
      --port 8763
  curl -X POST localhost:8763/sample -d '{"num_images":1,"seed":3}'
"""

import argparse
import json
import os
import sys

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pipeline_dir", type=str, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8763)
    p.add_argument("--batch_window_ms", type=float, default=5.0)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--af_precision", default="highest",
                   choices=["highest", "high", "default"],
                   help="circulant-matmul precision for the alias-free "
                        "ops: 'high' (3-pass, ~4e-5 err) serves the "
                        "256px VAE ~24% faster than exact 'highest'")
    args = p.parse_args()

    from afldm_tpu.ops import set_af_precision
    from afldm_tpu.pipelines.loading import (load_pipeline,
                                             init_random_pipeline)
    from afldm_tpu.serve import serve

    set_af_precision(args.af_precision)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.pipeline_dir:
        pipe = load_pipeline(args.pipeline_dir)
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
            vcfg.update(block_out_channels=[16, 16], layers_per_block=1,
                        norm_num_groups=8, down_filtered_act=[False, True],
                        up_filtered_act=[True, False], up_rescale=[True])
        pipe = init_random_pipeline(ucfg, vcfg, scfg)

    server, service = serve(pipe, host=args.host, port=args.port,
                            batch_window_ms=args.batch_window_ms,
                            max_batch=args.max_batch)
    print(f"sampler service on http://{args.host}:{args.port} "
          f"(POST /sample, GET /healthz /stats)")
    try:
        server.serve_forever()
    finally:
        service.close()


if __name__ == "__main__":
    main()
