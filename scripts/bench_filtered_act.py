"""Per-size benchmark of the WarpedNonlinearity backends on the real TPU:
XLA matmul path vs XLA spectral (FFT) path vs the fused Pallas kernel
(channel mode at latent sizes, spatial mode at VAE sizes).

Timing rule for the axon backend: block_until_ready may return before
remote execution finishes, so each timed call materializes an in-graph
scalar (see CLAUDE.md). Prints a markdown table for BENCH_NOTES.md.
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

from afldm_tpu.ops.ideal_lpf import filtered_nonlinearity  # noqa: E402
from afldm_tpu.ops.pallas_kernels import (filtered_act_pallas,  # noqa: E402
                                          pallas_mode)

SHAPES = [
    # (N, H, W, C)                  # where it occurs
    (1, 32, 32, 768),               # FFHQ UNet latent, deep blocks
    (8, 32, 32, 768),               # batched denoise
    (1, 64, 64, 512),               # SD latent / VAE 64px stage
    (1, 128, 128, 256),             # VAE 128px stage
    (1, 256, 256, 128),             # VAE 256px stage
    (4, 256, 256, 128),             # batched VAE
]


def timed(fn, x, iters):
    """Chain `iters` applications inside ONE jit so the axon relay's
    per-dispatch latency (~1.5 ms) doesn't dominate: the op maps shape ->
    same shape, so y_{k+1} = fn(y_k) keeps everything on-chip."""
    chained = jax.jit(lambda v: jax.lax.fori_loop(
        0, iters, lambda i, y: fn(y), v))
    out = chained(x)
    _ = float(out.sum())  # compile + settle
    t0 = time.perf_counter()
    out = chained(x)
    _ = float(out.sum())
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--grad", action="store_true",
                   help="also bench the backward pass")
    args = p.parse_args()

    print(f"backend={jax.default_backend()} device={jax.devices()[0]}")
    rows = []
    for shape in SHAPES:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                        jnp.float32)
        mode = pallas_mode(shape)
        fns = {
            "xla_matmul": jax.jit(
                lambda z: filtered_nonlinearity(z, "silu", impl="matmul")),
            "xla_spectral": jax.jit(
                lambda z: filtered_nonlinearity(z, "silu", impl="spectral")),
        }
        if mode is not None:
            fns["pallas"] = jax.jit(
                lambda z: filtered_act_pallas(z, "silu"))
        times = {}
        for name, fn in fns.items():
            try:
                times[name] = timed(fn, x, args.iters) * 1e3
            except Exception as e:  # noqa: BLE001 — report and continue
                times[name] = float("nan")
                print(f"  {shape} {name}: FAILED {type(e).__name__}: {e}")
        # correctness spot check vs matmul
        if mode is not None and np.isfinite(times.get("pallas", np.nan)):
            a = np.asarray(fns["pallas"](x))
            b = np.asarray(fns["xla_matmul"](x))
            err = float(np.abs(a - b).max())
        else:
            err = float("nan")
        rows.append((shape, mode, times, err))
        print(f"{shape} mode={mode} " + " ".join(
            f"{k}={v:.3f}ms" for k, v in times.items()) + f" maxerr={err:.2e}")

        if args.grad and mode is not None:
            gp = jax.jit(jax.grad(
                lambda z: (filtered_act_pallas(z, 'silu') ** 2).sum()))
            gx = jax.jit(jax.grad(
                lambda z: (filtered_nonlinearity(z, 'silu', impl='matmul')
                           ** 2).sum()))
            try:
                tp = timed(gp, x, max(args.iters // 3, 5)) * 1e3
                tx = timed(gx, x, max(args.iters // 3, 5)) * 1e3
                print(f"  grad: pallas={tp:.3f}ms xla_matmul={tx:.3f}ms")
            except Exception as e:  # noqa: BLE001
                print(f"  grad FAILED: {type(e).__name__}: {e}")

    print("\n| shape | mode | xla_matmul | xla_spectral | pallas | "
          "speedup vs best XLA | max err |")
    print("|---|---|---|---|---|---|---|")
    for shape, mode, t, err in rows:
        best_xla = min(t.get("xla_matmul", np.inf),
                       t.get("xla_spectral", np.inf))
        pl_t = t.get("pallas", float("nan"))
        sp = best_xla / pl_t if np.isfinite(pl_t) else float("nan")
        print(f"| {shape} | {mode} | {t.get('xla_matmul', np.nan):.3f} | "
              f"{t.get('xla_spectral', np.nan):.3f} | {pl_t:.3f} | "
              f"{sp:.2f}x | {err:.1e} |")


if __name__ == "__main__":
    main()
