"""SDPA backends on the real TPU: XLA einsum-softmax vs the Pallas flash
kernel (ops/attention.py), at the attention shapes the models actually
run (SD 64x64 = 4096 tokens, latent 32x32 = 1024, FFHQ head_dim 24).

Timing follows bench_filtered_act.py: chain iterations inside one jit
(out feeds back as q; k, v fixed) and materialize a scalar, so the axon
relay's dispatch latency and async-return quirks don't pollute numbers.
"""

import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from afldm_tpu.ops.attention import sdpa_xla, sdpa_flash  # noqa: E402

SHAPES = [
    # (B, heads, Lq, Lk, D)          # where it occurs
    (2, 8, 4096, 4096, 40),          # SD 64x64 self-attn (CFG batch 2)
    (8, 8, 4096, 4096, 40),          # video editing, 8 frames
    (2, 8, 1024, 1024, 80),          # SD 32x32 level
    (2, 8, 256, 256, 160),           # SD 16x16 level
    (1, 16, 1024, 1024, 24),         # FFHQ UNet 32x32 (head_dim 24)
    (8, 16, 1024, 1024, 24),         # batched FFHQ denoise
]


def timed(fn, q, k, v, iters):
    chained = jax.jit(lambda qq: jax.lax.fori_loop(
        0, iters, lambda i, y: fn(y, k, v), qq))
    out = chained(q)
    _ = float(out.sum())
    t0 = time.perf_counter()
    out = chained(q)
    _ = float(out.sum())
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--dtype", default="float32")
    p.add_argument("--block_q", type=int, default=512)
    p.add_argument("--block_k", type=int, default=1024)
    p.add_argument("--grad", action="store_true")
    args = p.parse_args()
    dtype = jnp.dtype(args.dtype)

    print(f"backend={jax.default_backend()} dtype={dtype} "
          f"blocks=({args.block_q},{args.block_k})")
    rows = []
    for (B, H, Lq, Lk, D) in SHAPES:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, Lq, D)), dtype)
        k = jnp.asarray(rng.standard_normal((B, H, Lk, D)), dtype)
        v = jnp.asarray(rng.standard_normal((B, H, Lk, D)), dtype)
        fl = lambda q_, k_, v_: sdpa_flash(  # noqa: E731
            q_, k_, v_, None, args.block_q, args.block_k)
        times = {}
        for name, fn in (("xla", sdpa_xla), ("flash", fl)):
            try:
                times[name] = timed(fn, q, k, v, args.iters) * 1e3
            except Exception as e:  # noqa: BLE001
                times[name] = float("nan")
                print(f"  {name} FAILED {type(e).__name__}: {e}")
        a = np.asarray(jax.jit(fl)(q, k, v), np.float32)
        b = np.asarray(jax.jit(sdpa_xla)(q, k, v), np.float32)
        err = float(np.abs(a - b).max())
        rows.append(((B, H, Lq, Lk, D), times, err))
        print(f"({B},{H},{Lq},{Lk},{D}) xla={times['xla']:.3f}ms "
              f"flash={times['flash']:.3f}ms maxerr={err:.2e}")

        if args.grad:
            gx = jax.grad(lambda q_, k_, v_: (sdpa_xla(q_, k_, v_)
                                              ** 2).sum(), (0, 1, 2))
            gf = jax.grad(lambda q_, k_, v_: (fl(q_, k_, v_) ** 2).sum(),
                          (0, 1, 2))
            it = max(args.iters // 3, 5)
            tx = timed(lambda q_, k_, v_: gx(q_, k_, v_)[0], q, k, v, it)
            tf = timed(lambda q_, k_, v_: gf(q_, k_, v_)[0], q, k, v, it)
            print(f"  grad: xla={tx * 1e3:.3f}ms flash={tf * 1e3:.3f}ms")

    print(f"\n| (B, heads, Lq, Lk, D) {dtype} | XLA | flash | speedup | "
          "max err |")
    print("|---|---|---|---|---|")
    for shape, t, err in rows:
        sp = t["xla"] / t["flash"] if np.isfinite(t["flash"]) else float("nan")
        print(f"| {shape} | {t['xla']:.3f} | {t['flash']:.3f} | {sp:.2f}x | "
              f"{err:.1e} |")


if __name__ == "__main__":
    main()
