"""Backward-inclusive (block_q, block_k) sweep for the flash SDPA kernel.

Why: the forward-only sweeps (results/bench_flash_sweep.json round-5 bf16,
round-2 f32) put (1024, 1024) ~5-13% ahead of the shipped (512, 1024)
default at the 4096-token flagship shape — but the default also governs
the custom-VJP backward (`_flash_bwd_3d`), whose dq/dkv kernels hold
do/delta blocks on top of the score tile and were unmeasured above
bq=512. This script measures a full value-and-grad chain (fwd + both bwd
kernels, the training-step usage) per candidate block so the default can
follow a bwd-inclusive number instead of a fwd-only one.

Methodology matches bench_flash_sweep.py: one jitted `lax.scan` chain of
`--iters` *dependent* grad steps (in-graph scalar materialization at the
end), min over 3 repeats — immune to relay round-trip latency.

Run on the real TPU, ONE job at a time on the relay:
  python scripts/bench_flash_bwd_sweep.py [--dtype bf16] [--iters 10]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--tokens", type=int, default=4096)
    p.add_argument("--dim", type=int, default=80)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["f32", "bf16"])
    p.add_argument("--out", type=str,
                   default="results/bench_flash_bwd_sweep.json")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from afldm_tpu.ops.attention import sdpa_flash

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    B, H, L, D = args.batch, args.heads, args.tokens, args.dim
    r = np.random.default_rng(0)

    def rand():
        return jnp.asarray(r.standard_normal((B, H, L, D)), dt)

    q0, k0, v0 = rand(), rand(), rand()
    rows = []

    def record(**kw):
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    def measure_grad(bq, bk):
        def loss(q, k, v):
            o = sdpa_flash(q, k, v, None, bq, bk)
            return jnp.sum(jnp.square(o.astype(jnp.float32)))

        grad = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def g(q, k, v):
            def body(c, _):
                dq, dk, dv = grad(c, k, v)
                # fold all three grads into the carry so every step
                # depends on the previous one (no overlap across iters)
                nxt = (c + 1e-6 * (dq + dk + dv)).astype(dt)
                return nxt, None
            return jax.lax.scan(body, q, None, length=args.iters)[0]

        float(g(q0, k0, v0).sum())            # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(q0, k0, v0).sum())
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    def measure_fwd(bq, bk):
        @jax.jit
        def g(q, k, v):
            def body(c, _):
                return sdpa_flash(c, k, v, None, bq, bk).astype(dt), None
            return jax.lax.scan(body, q, None, length=args.iters)[0]

        float(g(q0, k0, v0).sum())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(q0, k0, v0).sum())
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    blocks = [(256, 1024), (512, 512), (512, 1024), (512, 2048),
              (1024, 512), (1024, 1024), (2048, 512)]
    for bq, bk in blocks:
        if bq * bk * 4 > 8 * 2 ** 20:       # f32 score-tile VMEM guard
            continue
        row = dict(kind="bwd_sweep", bq=bq, bk=bk, dtype=args.dtype,
                   shape=[B, H, L, D], iters=args.iters)
        try:
            row["grad_ms"] = round(measure_grad(bq, bk), 3)
            row["fwd_ms"] = round(measure_fwd(bq, bk), 3)
            row["bwd_ms"] = round(row["grad_ms"] - row["fwd_ms"], 3)
        except Exception as e:              # Mosaic VMEM OOM etc
            row["error"] = str(e)[:200]
        record(**row)

    ok = [r_ for r_ in rows if "grad_ms" in r_]
    if ok:
        base = next((r_ for r_ in ok
                     if (r_["bq"], r_["bk"]) == (512, 1024)), None)
        best = min(ok, key=lambda r_: r_["grad_ms"])
        record(kind="summary", dtype=args.dtype,
               default_grad_ms=base["grad_ms"] if base else None,
               best_block=[best["bq"], best["bk"]],
               best_grad_ms=best["grad_ms"],
               speedup_vs_default=round(
                   base["grad_ms"] / best["grad_ms"], 4) if base else None)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    payload = {"rows": rows, "args": vars(args)}
    # merge dtypes across runs instead of clobbering
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                prev = json.load(f)
            prev_rows = [r_ for r_ in prev.get("rows", [])
                         if r_.get("dtype") != args.dtype]
            payload["rows"] = prev_rows + rows
        except Exception:
            pass
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
