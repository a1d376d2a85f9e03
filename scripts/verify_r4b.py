"""Verify driver (round 4, commit B): the ops/shift review fixes, driven
through the public API on the real TPU.

1. SRConv: symmetric boundary reflection — the separable strided conv (H,
   jitted on TPU) equals applying the reference's literal H_small matrix
   (superresolution.py:176-186 transcription) along each axis; H_pinv uses
   the reference's 3e-2 singular-value truncation and right-inverts H.
2. flow_warp on bf16 512px inputs: finite (no out-of-range gathers from
   bf16-quantized clip bounds) and close to the f32 result.
3. set_af_precision takes effect at CALL time on an already-traced shape:
   on the real MXU, 'high' (3-pass bf16) must actually CHANGE
   filtered_nonlinearity's output vs 'highest' without rebuilding any jit.
4. jax.grad through filtered_act_fused with act='gelu'/'mish' at a
   Pallas-dispatched shape (128px -> spatial kernel) matches the XLA path.
5. sdpa2 on an unaligned-Lq bf16 shape (XLA fallback) returns bf16, and
   forced 'flash' on mismatched KV lengths raises.
6. conv2d_resample keeps bf16 inputs bf16.
"""
import os
import sys
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

t0 = time.time()
print("devices:", jax.devices(), flush=True)
on_tpu = jax.devices()[0].platform != "cpu"

# --- 1: SRConv vs the reference's literal conv-matrix loop ---
from afldm_tpu.ops import SRConv, build_sr_bicubic  # noqa: E402
from afldm_tpu.ops.superresolution import bicubic_kernel_1d  # noqa: E402


def reference_h_small(kernel, img_dim, stride):
    klen = len(kernel)
    Hs = np.zeros((img_dim // stride, img_dim), np.float32)
    for i in range(stride // 2, img_dim + stride // 2, stride):
        for j in range(i - klen // 2, i + klen // 2):
            je = j
            if je < 0:
                je = -je - 1
            if je >= img_dim:
                je = (img_dim - 1) - (je - img_dim)
            Hs[i // stride, je] += kernel[j - i + klen // 2]
    return Hs


k = bicubic_kernel_1d(4)
h = SRConv(k, 3, 64, stride=4)
A = reference_h_small(np.asarray(k), 64, 4)
x = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
got = np.asarray(jax.jit(h.H)(jnp.asarray(x)))
want = np.einsum("Ww,nhwc->nhWc", A, np.einsum("Hh,nhwc->nHwc", A, x))
e1 = float(np.max(np.abs(got - want)))
print("SRConv.H vs reference H_small:", e1, flush=True)
assert e1 < 1e-4, e1
# H(H_pinv(y)) ~ y on the row space (truncated pinv is a right inverse
# up to the zeroed border modes)
y = np.asarray(jax.jit(h.H)(jnp.asarray(x)))
y2 = np.asarray(jax.jit(lambda v: h.H(h.H_pinv(v)))(jnp.asarray(y)))
e1b = float(np.max(np.abs(y2 - y)))
print("SRConv H(H_pinv(y)) - y:", e1b, flush=True)
assert e1b < 2e-2, e1b
_ = build_sr_bicubic(4, 64)  # builder path imports clean

# --- 2: flow_warp bf16 at 512px ---
from afldm_tpu.shift import flow_warp  # noqa: E402

x32 = jnp.asarray(np.random.default_rng(1).standard_normal((1, 512, 512, 1)),
                  jnp.float32)
fl = jnp.full((1, 512, 512, 2), 0.5, jnp.float32)
ref32 = np.asarray(jax.jit(flow_warp)(x32, fl))
gotbf = np.asarray(jax.jit(flow_warp)(x32.astype(jnp.bfloat16), fl)
                   ).astype(np.float32)
assert np.isfinite(gotbf).all(), "NaNs in bf16 flow_warp"
e2 = float(np.max(np.abs(gotbf - ref32)))
print("flow_warp bf16 vs f32 max err:", e2, flush=True)
assert e2 < 0.15, e2

# --- 3: af_precision call-time effect on a pre-traced shape ---
from afldm_tpu.ops import filtered_nonlinearity, set_af_precision  # noqa: E402

xm = jnp.asarray(np.random.default_rng(2).standard_normal((1, 128, 128, 8)),
                 jnp.float32)
base = np.asarray(filtered_nonlinearity(xm))  # traces at 'highest'
try:
    set_af_precision("high")
    high = np.asarray(filtered_nonlinearity(xm))  # same shape, NO fresh jit
finally:
    set_af_precision("highest")
back = np.asarray(filtered_nonlinearity(xm))
e3 = float(np.max(np.abs(high - base)))
e3b = float(np.max(np.abs(back - base)))
print("precision switch delta (high vs highest):", e3, " back:", e3b,
      flush=True)
assert e3b == 0.0, e3b  # switching back restores the exact path
if on_tpu:
    # on the MXU the 3-pass path differs from 6-pass by ~1e-5..1e-3;
    # zero delta would mean the stale-trace bug is back
    assert 1e-8 < e3 < 1e-2, e3

# --- 4: grads through the fused kernel for gelu/mish at a spatial shape ---
from afldm_tpu.ops.pallas_kernels import filtered_act_fused  # noqa: E402

xg = jnp.asarray(np.random.default_rng(3).standard_normal((1, 128, 128, 4)),
                 jnp.float32)
for act in ("gelu", "mish"):
    g_fused = np.asarray(jax.jit(jax.grad(
        lambda a, ac=act: filtered_act_fused(a, ac).sum()))(xg))
    g_xla = np.asarray(jax.jit(jax.grad(
        lambda a, ac=act: filtered_nonlinearity(a, ac).sum()))(xg))
    e4 = float(np.max(np.abs(g_fused - g_xla)))
    print(f"fused {act} grad vs XLA:", e4, flush=True)
    assert e4 < 5e-4, (act, e4)

# --- 5: sdpa2 fallback dtype + forced-flash raise ---
from afldm_tpu.ops import sdpa2, set_attention_impl  # noqa: E402

r = np.random.default_rng(4)
q77 = jnp.asarray(r.standard_normal((2, 2, 77, 32)), jnp.bfloat16)
kv77 = [jnp.asarray(r.standard_normal((2, 2, 77, 32)), jnp.bfloat16)
        for _ in range(4)]
o77 = jax.jit(lambda *a: sdpa2(*a, 0.5))(q77, *kv77)
print("sdpa2 fallback dtype:", o77.dtype, flush=True)
assert o77.dtype == jnp.bfloat16, o77.dtype

set_attention_impl("flash")
try:
    sdpa2(q77, kv77[0], kv77[1],
          jnp.concatenate([kv77[2]] * 2, axis=-2),
          jnp.concatenate([kv77[3]] * 2, axis=-2), 0.5)
    raise AssertionError("forced flash on mismatched KV did not raise")
except ValueError as e:
    print("forced-flash raise ok:", str(e)[:60], flush=True)
finally:
    set_attention_impl("auto")

# --- 6: conv2d_resample dtype restore ---
from afldm_tpu.ops import conv2d_resample, setup_filter  # noqa: E402

xb = jnp.asarray(r.standard_normal((1, 8, 8, 3)), jnp.bfloat16)
wb = jnp.asarray(r.standard_normal((3, 3, 3, 5)), jnp.bfloat16)
fb = setup_filter([1, 3, 3, 1], separable=False)
ob = jax.jit(lambda a, b: conv2d_resample(a, b, fb, up=2, down=2,
                                          padding=1))(xb, wb)
print("conv2d_resample bf16 out dtype:", ob.dtype, flush=True)
assert ob.dtype == jnp.bfloat16, ob.dtype

print("VERIFY_OK in", round(time.time() - t0, 1), "s", flush=True)
