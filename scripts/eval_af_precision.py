"""Measure the accuracy cost of set_af_precision("high") on the flagship
AF arm's shift-equivariance eval (VERDICT r3 item 3: is the +24% VAE
throughput of the 3-pass circulant matmuls inside the 0.1 dB budget?).

Runs the exact flagship eval protocol twice (HIGHEST vs HIGH) on the
trained AF pipeline and reports the PSNR delta. Real TPU, one job on the
relay:

  python scripts/eval_af_precision.py [--shift_steps 8] [--eval_steps 50]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pipe_dir", default=os.path.join(
        REPO, "results/flagship_ab/af/ldm/pipeline"))
    p.add_argument("--eval_steps", type=int, default=50)
    p.add_argument("--shift_steps", type=int, default=8)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--precisions", default="highest,high",
                   help="comma list from {highest,high,default}; 'highest' "
                        "is always prepended as the golden arm")
    p.add_argument("--out", default="results/af_precision_eval.json")
    args = p.parse_args()

    import numpy as np
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    from afldm_tpu.ops import set_af_precision
    from afldm_tpu.pipelines.loading import load_pipeline
    from afldm_tpu.pipelines.shift_eval import shift_equivariance_eval

    precisions = [s.strip() for s in args.precisions.split(",") if s.strip()]
    if "highest" not in precisions:
        precisions.insert(0, "highest")

    rows = {}
    for prec in precisions:
        set_af_precision(prec)
        try:
            # fresh pipeline per precision: the knob is trace-time and the
            # pipelines cache their jitted programs (CLAUDE.md)
            pipe = load_pipeline(args.pipe_dir, use_ema=True)
            res = shift_equivariance_eval(
                pipe, key=jax.random.PRNGKey(args.seed),
                num_inference_steps=args.eval_steps,
                num_shift_steps=args.shift_steps, batch_shifts=True)
        finally:
            set_af_precision("highest")
        psnrs = np.asarray(res.psnrs, np.float64)
        rows[prec] = {"mean_masked_psnr": round(float(psnrs.mean()), 4),
                      "psnrs": [round(float(v), 3) for v in psnrs]}
    for prec in precisions:
        if prec == "highest":
            continue
        rows[f"{prec}_minus_highest_db"] = round(
            rows[prec]["mean_masked_psnr"]
            - rows["highest"]["mean_masked_psnr"], 4)
    if "high" in rows:
        rows["within_0p1_db"] = abs(rows["high_minus_highest_db"]) <= 0.1
    rows["eval_steps"] = args.eval_steps
    rows["shift_steps"] = args.shift_steps
    print(json.dumps(rows, indent=2))
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
