"""Experiment: int8 weight-only inference for the batch-1 denoise.

Hypothesis: the batch-1 FFHQ denoise is partly weight-read-bound (bf16
weights gave +5-10%), so int8 weights (per-output-channel symmetric,
dequantized on the fly) could cut weight traffic another 2x.

Counter-hypothesis: XLA hoists the (loop-invariant) dequantize out of
the 50-step scan, materializing full-precision weights in HBM once per
call — after which the loop reads the SAME bytes as the baseline and
the only effect is quantization error.

This script measures both sides: steps/s for f32 / bf16-weights /
int8->f32 / int8->bf16, plus the quantized output deviation. Results in
BENCH_NOTES.md / ROADMAP.md.
"""

import os
import sys
import time
from typing import Any, NamedTuple

import numpy as np

sys.path.insert(0,
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class QuantLeaf(NamedTuple):
    q: Any     # int8 values
    s: Any     # f32 per-output-channel scale, broadcastable to q


def main():
    import jax
    import jax.numpy as jnp
    import bench
    bench._enable_compile_cache()

    def quantize(params):
        def q(p):
            if p.ndim >= 2:
                s = jnp.max(jnp.abs(p), axis=tuple(range(p.ndim - 1)),
                            keepdims=True) / 127.0
                s = jnp.where(s == 0, 1.0, s).astype(jnp.float32)
                return QuantLeaf(jnp.round(p / s).astype(jnp.int8), s)
            return p
        return jax.tree_util.tree_map(q, params)

    def dequantize(qparams, dtype):
        def d(x):
            if isinstance(x, QuantLeaf):
                return (x.q.astype(jnp.float32) * x.s).astype(dtype)
            return x
        return jax.tree_util.tree_map(
            d, qparams, is_leaf=lambda x: isinstance(x, QuantLeaf))

    unet, denoise = bench.build()
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 32, 32, 4), jnp.float32)
    params = jax.jit(unet.init)(key, x0, jnp.asarray([0]))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 4),
                            jnp.float32)
    qparams = jax.jit(quantize)(params)
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    qbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(qparams))
    print(f"param bytes: f32 {nbytes/1e6:.0f}MB -> int8+scales "
          f"{qbytes/1e6:.0f}MB", file=sys.stderr)

    def timed(fn, *args, repeats=3):
        _, s = fn(*args)
        float(s)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            _, s = fn(*args)
            float(s)
            best = min(best, time.perf_counter() - t0)
        return 50 / best

    results = {}
    results["f32"] = timed(denoise, params, lat)
    bf16_params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def denoise_cast(p, lat):
        return denoise(jax.tree_util.tree_map(
            lambda w: w.astype(jnp.float32), p), lat)

    results["bf16_weights"] = timed(denoise_cast, bf16_params, lat)

    out_ref, _ = denoise(params, lat)
    for dt, name in ((jnp.float32, "int8_to_f32"),
                     (jnp.bfloat16, "int8_to_bf16")):
        @jax.jit
        def denoise_q(qp, lat, _dt=dt):
            return denoise(dequantize(qp, _dt), lat)
        results[name] = timed(denoise_q, qparams, lat)
        out_q, _ = denoise_q(qparams, lat)
        dev = float(jnp.abs(out_q.astype(jnp.float32)
                            - out_ref.astype(jnp.float32)).max())
        rel = dev / float(jnp.abs(out_ref).max())
        print(f"{name}: max |dev| {dev:.3f} (rel {rel:.3f}) after 50 steps",
              file=sys.stderr)

    for k, v in results.items():
        print(f"{k}: {v:.1f} steps/s")


if __name__ == "__main__":
    main()
