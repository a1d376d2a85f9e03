"""Verify driver (round 4, commit A): exercise the changed paths through
the public API on the real TPU.

1. VAETrainer.validate with a valid set -> valid_recon_ffd present/finite
   (trainer built via create_trainer from a training config, the public
   entry train.py uses).
2. frechet_distance sanity: identical stats -> ~0; shifted stats -> >0.
"""
import json
import os
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402

from afldm_tpu.train import (create_trainer, load_training_config,  # noqa: E402
                             make_dataset, render_dead_leaves_folder)
from afldm_tpu.utils.metric_utils import FeatureStats, frechet_distance  # noqa: E402

t0 = time.time()
print("devices:", jax.devices(), flush=True)

# --- 2 first (cheap, host-side) ---
r = np.random.default_rng(0)
fa = r.standard_normal((64, 16)).astype(np.float32)
sa = FeatureStats(capture_mean_cov=True); sa.append(fa)
sb = FeatureStats(capture_mean_cov=True); sb.append(fa.copy())
d0 = frechet_distance(sa, sb)
sc = FeatureStats(capture_mean_cov=True); sc.append(fa + 3.0)
d1 = frechet_distance(sa, sc)
print("ffd(identical) =", d0, " ffd(shifted+3) =", d1, flush=True)
assert abs(d0) < 1e-3, d0
assert 64 * 0.5 < d1 < 64 * 20, d1  # ~ |mu shift|^2 * dim = 9*16 = 144

# --- 1: trainer.validate on the real TPU ---
tmp = tempfile.mkdtemp()
tr_dir = os.path.join(tmp, "train"); va_dir = os.path.join(tmp, "valid")
render_dead_leaves_folder(tr_dir, resolution=32, length=4, seed=0)
render_dead_leaves_folder(va_dir, resolution=32, length=4, seed=1)

cfg = {
    "base": {
        "output_dir": os.path.join(tmp, "out"), "logging_dir": "logs",
        "resolution": 32, "train_batch_size": 2, "num_epochs": 1,
        "seed": 0, "checkpointing_steps": 10000,
        "mixed_precision": None, "random_flip": False,
        "train_data_dir": tr_dir, "valid_data_dir": va_dir,
    },
    "vae": {
        "model_cfg": os.path.join(tmp, "vae_model_cfg.json"),
        "use_shift_loss": False, "use_disc": False,
        "perceptual_weight": 0.0, "kl_weight": 1e-6, "use_ema": False,
        "learning_rate": 1e-4, "lr_warmup_steps": 1,
        "gradient_accumulation_steps": 1,
    },
}
with open(os.path.join(tmp, "vae_model_cfg.json"), "w") as f:
    json.dump({
        "in_channels": 3, "out_channels": 3, "latent_channels": 2,
        "block_out_channels": [8, 16], "layers_per_block": 1,
        "norm_num_groups": 4, "sample_size": 32, "alias_free": True,
    }, f)
cfg_path = os.path.join(tmp, "cfg.json")
with open(cfg_path, "w") as f:
    json.dump(cfg, f)

# same construction sequence as train.py (the public CLI entry)
tcfg = load_training_config(cfg_path)
trainer = create_trainer("vae", tcfg["base"], tcfg["vae"])
trainer.init_modules()
trainer.set_dataset(make_dataset(tcfg["base"]))
trainer.init_optimizers(total_steps=2)
trainer.prepare_modules()
out = trainer.validate(global_step=0)
scalars = {k: round(float(v), 4) for k, v in out.items()
           if np.ndim(v) == 0}
print("validate:", json.dumps(scalars, indent=None), flush=True)
assert "valid_recon_ffd" in out, out.keys()
assert np.isfinite(out["valid_recon_ffd"]), out
# --- 3: bf16 operator-split circulant path on the real MXU ---
import jax.numpy as jnp  # noqa: E402

from afldm_tpu.ops import set_af_bf16_split, set_af_precision  # noqa: E402
from afldm_tpu.ops.ideal_lpf import filtered_nonlinearity_matmul  # noqa: E402

xb = jnp.asarray(np.random.default_rng(2).standard_normal((2, 16, 16, 8)),
                 jnp.bfloat16)


def fresh(split, prec):
    # trace-time knobs -> fresh jit per setting
    set_af_precision(prec)
    set_af_bf16_split(split)
    try:
        f = jax.jit(lambda x: filtered_nonlinearity_matmul(x, "silu"))
        return np.asarray(f(xb), np.float32)
    finally:
        set_af_bf16_split(False)
        set_af_precision("highest")


want = fresh(False, "highest")
got_split = fresh(True, "highest")
got_1pass = fresh(False, "default")
e_split = float(np.max(np.abs(got_split - want)))
e_1pass = float(np.max(np.abs(got_1pass - want)))
print("bf16 split err:", e_split, " 1-pass err:", e_1pass, flush=True)
assert e_split < 2e-2, e_split
# split must be at least as accurate as 1-pass (small slack: both paths
# share the bf16-intermediate quantization, with different realizations).
# MXU-only: on CPU, DEFAULT precision is already exact f32, so 1-pass has
# zero error and the comparison is meaningless.
if jax.devices()[0].platform != "cpu":
    assert e_split <= e_1pass * 1.1 + 1e-4, (e_split, e_1pass)

# --- 4: sdpa2 dispatcher — unfused knob matches fused in value AND dtype
from afldm_tpu.ops.attention import (sdpa2, set_attention_impl,  # noqa: E402
                                     set_sdpa2_fused)

qkv = [jnp.asarray(np.random.default_rng(3).standard_normal((2, 2, 256, 16)),
                   jnp.bfloat16) for _ in range(5)]
al = jnp.asarray([0.25, 0.75], jnp.float32)


def run_sdpa2(fused):
    # force the flash branch: 256 tokens is below the auto crossover, and
    # the knob under test only exists inside that branch
    set_attention_impl("flash")
    set_sdpa2_fused(fused)
    try:
        return jax.jit(lambda *a: sdpa2(*a))(*qkv, al)
    finally:
        set_sdpa2_fused(True)
        set_attention_impl("auto")


of = run_sdpa2(True)
ou = run_sdpa2(False)
assert of.dtype == ou.dtype, (of.dtype, ou.dtype)
d2 = float(jnp.max(jnp.abs(of.astype(jnp.float32) - ou.astype(jnp.float32))))
print("sdpa2 fused-vs-unfused max diff:", d2, " dtype:", of.dtype, flush=True)
assert d2 < 5e-2, d2

print("VERIFY_OK in", round(time.time() - t0, 1), "s", flush=True)
