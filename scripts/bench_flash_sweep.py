"""Block-size sweep + bottleneck attribution for the flash SDPA kernels.

Round-4 measurements showed the fused two-KV kernel at 1.167x over two
flash passes, and f32 vs bf16 inputs timing identically — which says the
op is COMPUTE-bound (DEFAULT-precision dots run bf16 MXU passes either
way), not HBM-bound. This script pins that down on the real TPU:

  1. sweep (block_q, block_k) for sdpa_flash and sdpa2_flash at the
     flagship shapes — block_q sets the KV-rescan count (Lq/bq), so if
     HBM mattered, larger bq would win;
  2. attribution probes at the default blocks: a dots-only kernel
     (same grid/loads/matmuls, softmax replaced by identity -> the
     MXU+memory floor) and a stream-only kernel (loads everything,
     trivial VPU work -> the pure memory floor). total - dots_only
     approximates the online-softmax VPU share.

Run on the real TPU, ONE job at a time on the relay:
  python scripts/bench_flash_sweep.py [--dtype bf16] [--iters 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=17)
    p.add_argument("--batch", type=int, default=8,
                   help="single-KV sdpa batch (roofline denoise batch)")
    p.add_argument("--heads", type=int, default=8)
    p.add_argument("--tokens", type=int, default=4096)
    p.add_argument("--dim", type=int, default=80)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", type=str, default="bf16",
                   choices=["f32", "bf16"])
    p.add_argument("--out", type=str,
                   default="results/bench_flash_sweep.json")
    args = p.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    from afldm_tpu.ops.attention import (sdpa_flash, sdpa2_flash,
                                         _pick_block)
    from afldm_tpu.ops.pallas_kernels import _interpret

    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    H, L, D = args.heads, args.tokens, args.dim
    r = np.random.default_rng(0)

    def rand(B):
        return jnp.asarray(r.standard_normal((B, H, L, D)), dt)

    rows = []

    def measure(f1, x0, xs):
        """In-graph scan chain of iters dependent calls (relay-latency
        methodology of bench_sdpa2.py)."""
        @jax.jit
        def g(x0, *xs):
            def body(c, _):
                return f1(c, *xs).astype(dt), None
            return jax.lax.scan(body, x0, None, length=args.iters)[0]
        float(g(x0, *xs).sum())           # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(g(x0, *xs).sum())
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best * 1e3

    def record(**kw):
        rows.append(kw)
        print(json.dumps(kw), flush=True)

    # ------------------------------------------------------------------
    # 1. block sweep
    # ------------------------------------------------------------------
    blocks = [(256, 1024), (512, 512), (512, 1024), (512, 2048),
              (1024, 512), (1024, 1024), (2048, 512)]

    q1, k1v, v1v = rand(args.batch), rand(args.batch), rand(args.batch)
    for bq, bk in blocks:
        if bq * bk * 4 > 8 * 2 ** 20:      # s-tile f32 VMEM guard
            continue
        try:
            ms = measure(lambda c, k, v: sdpa_flash(c, k, v, None, bq, bk),
                         q1, (k1v, v1v))
        except Exception as e:  # Mosaic VMEM OOM etc — record, keep going
            record(kind="sweep", op="sdpa", bq=bq, bk=bk, dtype=args.dtype,
                   error=str(e)[:200])
            continue
        record(kind="sweep", op="sdpa", bq=bq, bk=bk, dtype=args.dtype,
               shape=[args.batch, H, L, D], ms=round(ms, 3))

    q2, k20, v20, k21, v21 = (rand(args.frames) for _ in range(5))
    alpha = jnp.asarray(np.linspace(0, 1, args.frames), jnp.float32)
    for bq, bk in blocks:
        if bq * bk * 4 > 5 * 2 ** 20:      # two live softmax states
            continue
        try:
            ms = measure(
                lambda c, k0, v0, k1, v1: sdpa2_flash(
                    c, k0, v0, k1, v1, alpha, None, bq, bk),
                q2, (k20, v20, k21, v21))
        except Exception as e:
            record(kind="sweep", op="sdpa2", bq=bq, bk=bk, dtype=args.dtype,
                   error=str(e)[:200])
            continue
        record(kind="sweep", op="sdpa2", bq=bq, bk=bk, dtype=args.dtype,
               shape=[args.frames, H, L, D], ms=round(ms, 3))

    # ------------------------------------------------------------------
    # 2. attribution probes (default blocks 512/1024, single-KV shape)
    # ------------------------------------------------------------------
    bq, bk = _pick_block(L, 512), _pick_block(L, 1024)

    def dots_only_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        s = jax.lax.dot_general(
            q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc_ref[...] += jax.lax.dot_general(
            s.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def stream_only_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref):
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # touch every loaded block with trivial VPU work, no MXU
        acc_ref[...] += (q_ref[0].astype(jnp.float32)
                         + jnp.sum(k_ref[0].astype(jnp.float32), axis=0,
                                   keepdims=True)
                         + jnp.sum(v_ref[0].astype(jnp.float32), axis=0,
                                   keepdims=True))

        @pl.when(kk == pl.num_programs(2) - 1)
        def _():
            o_ref[0] = acc_ref[...].astype(o_ref.dtype)

    def probe(kernel, q, k, v):
        B3 = q.shape[0] * q.shape[1]

        def run3(q3, k3, v3):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((B3, L, D), q.dtype),
                grid=(B3, L // bq, L // bk),
                interpret=_interpret(),
                in_specs=[
                    pl.BlockSpec((1, bq, D), lambda b, i, kk: (b, i, 0)),
                    pl.BlockSpec((1, bk, D), lambda b, i, kk: (b, kk, 0)),
                    pl.BlockSpec((1, bk, D), lambda b, i, kk: (b, kk, 0)),
                ],
                out_specs=pl.BlockSpec((1, bq, D),
                                       lambda b, i, kk: (b, i, 0)),
                scratch_shapes=[pltpu.VMEM((bq, D), jnp.float32)],
            )(q3, k3, v3)

        def f1(c, k, v):
            out = run3(c.reshape(B3, L, D), k.reshape(B3, L, D),
                       v.reshape(B3, L, D))
            return out.reshape(c.shape)

        return measure(f1, q, (k, v))

    flash_ms = measure(lambda c, k, v: sdpa_flash(c, k, v, None, 512, 1024),
                       q1, (k1v, v1v))
    dots_ms = probe(dots_only_kernel, q1, k1v, v1v)
    stream_ms = probe(stream_only_kernel, q1, k1v, v1v)
    record(kind="probe", op="sdpa", dtype=args.dtype,
           shape=[args.batch, H, L, D], bq=bq, bk=bk,
           flash_ms=round(flash_ms, 3), dots_only_ms=round(dots_ms, 3),
           stream_only_ms=round(stream_ms, 3),
           softmax_share=round(1.0 - dots_ms / flash_ms, 3),
           mem_share=round(stream_ms / flash_ms, 3))

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
