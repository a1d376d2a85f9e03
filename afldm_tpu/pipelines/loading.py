"""Pipeline (de)serialization — the deployable-artifact tier of the
reference's checkpoint story (SURVEY.md §5.4): a pipeline directory holds
model config JSONs plus an Orbax ``checkpoint-{step}`` with params. Random
initialization is the zero-egress fallback for the published HF checkpoints
(`SingleZombie/*`), which a weight converter can drop in when available."""

import json
import os

import jax
import jax.numpy as jnp

from ..models import (UNet2DModel, UNet2DConfig, AutoencoderKL,
                      AutoencoderKLConfig)
from ..schedulers import DDIMScheduler, I2SBScheduler
from .ldm import LDMPipeline
from .i2sb import I2SBLDMPipeline


def _load_json(path):
    with open(path) as f:
        return json.load(f)


def init_random_pipeline(unet_config, vae_config, scheduler_config,
                         cls=LDMPipeline, seed=0, dtype=jnp.float32):
    if isinstance(unet_config, dict):
        unet_config = UNet2DConfig.from_diffusers(unet_config,
                                                  alias_free=True)
    if isinstance(vae_config, dict):
        vae_config = AutoencoderKLConfig.from_diffusers(vae_config)
    unet = UNet2DModel(unet_config, dtype=dtype)
    vae = AutoencoderKL(vae_config, dtype=dtype)
    key = jax.random.PRNGKey(seed)
    lat = jnp.zeros((1, unet_config.sample_size, unet_config.sample_size,
                     unet_config.in_channels), jnp.float32)
    img_res = unet_config.sample_size * vae_config.downsample_ratio
    img = jnp.zeros((1, img_res, img_res, vae_config.in_channels),
                    jnp.float32)
    k1, k2 = jax.random.split(key)
    unet_params = jax.jit(unet.init)(k1, lat, jnp.zeros((1,), jnp.int32))
    vae_params = jax.jit(vae.init)(k2, img)
    sched_cls = (I2SBScheduler if cls is I2SBLDMPipeline else DDIMScheduler)
    scheduler = sched_cls.from_config(scheduler_config)
    return cls(vae, vae_params, unet, unet_params, scheduler)


def load_pipeline(pipeline_dir, cls=LDMPipeline, scheduler_config=None,
                  use_ema=True, dtype=jnp.float32, allow_random=False,
                  af_precision=None):
    """Load a pipeline saved by a trainer's ``save_pipeline``.

    Fails loud (VERDICT r3 item 4): a missing ``checkpoint-{n}`` dir or a
    missing unet/vae param subtree raises unless ``allow_random=True`` —
    the repo's acceptance metrics are PSNR numbers, and a typo'd path must
    never silently score random weights.

    ``af_precision`` ('highest'|'high'|'default') is the serving-side
    counterpart of ``BaseConfig.af_precision``: it sets the process-wide
    circulant-matmul MXU precision (ops.set_af_precision) before the
    pipeline traces. 'default' measured +0.017 dB eval PSNR (within the
    0.1 dB budget) and 1.30x on the b8 bf16 denoise step vs 'highest' on
    the trained pass-2 AF pipeline (BENCH_NOTES.md, results/
    af_precision_eval.json). None leaves the global untouched (exact)."""
    if af_precision is not None:
        from ..ops import set_af_precision
        set_af_precision(af_precision)
    from ..train.checkpoint import (latest_checkpoint,
                                    restore_checkpoint_lenient)

    unet_config = _load_json(os.path.join(pipeline_dir, "unet_config.json"))
    vae_config = _load_json(os.path.join(pipeline_dir, "vae_config.json"))
    if scheduler_config is None:
        p = os.path.join(pipeline_dir, "scheduler_config.json")
        scheduler_config = _load_json(p) if os.path.exists(p) else {
            "num_train_timesteps": 1000, "beta_schedule": "scaled_linear",
            "beta_start": 0.0015, "beta_end": 0.0195, "clip_sample": False,
            "set_alpha_to_one": False, "steps_offset": 1,
            "timestep_spacing": "leading"}

    pipe = init_random_pipeline(unet_config, vae_config, scheduler_config,
                                cls=cls, dtype=dtype)
    ckpt = latest_checkpoint(pipeline_dir)
    if ckpt is None:
        if not allow_random:
            raise FileNotFoundError(
                f"no checkpoint-* directory under {pipeline_dir!r}; pass "
                "allow_random=True to score random-initialized weights")
        return pipe
    target = {"unet": jax.device_get(pipe.unet_params),
              "unet_ema": jax.device_get(pipe.unet_params),
              "vae": jax.device_get(pipe.vae_params)}
    # lenient restore adapts to what the dir actually holds (EMA off is
    # saved as {}); it raises on real corruption instead of silently
    # returning random params
    state = restore_checkpoint_lenient(ckpt, target)
    key = "unet_ema" if use_ema and state.get("unet_ema") else "unet"
    missing = [name for name, sub in (("unet/unet_ema", state.get(key)),
                                      ("vae", state.get("vae"))) if not sub]
    if missing and not allow_random:
        raise FileNotFoundError(
            f"checkpoint {ckpt!r} holds no params for {missing}; pass "
            "allow_random=True to keep random weights for those subtrees")
    if state.get(key):
        pipe.unet_params = jax.device_put(state[key])
    if state.get("vae"):
        pipe.vae_params = jax.device_put(state["vae"])
    return pipe


def load_sd_components(pipeline_dir, dtype=jnp.float32,
                       allow_random=False):
    """Load the SD-family components from a converted / trained pipeline
    directory (the layout scripts/convert_reference_checkpoint.py emits:
    ``unet_config.json`` with cross-attention keys, ``vae_config.json``,
    optional ``controlnet_config.json``, optional ``text_encoder/`` +
    ``tokenizer/`` subfolders, ``checkpoint-{n}``).

    Returns a dict with ``unet/unet_params/vae/vae_params`` and, when
    present, ``controlnet/controlnet_params``, ``text_encoder``,
    ``scheduler_config`` — the constructor kwargs of the SD pipelines
    (video editing / interpolation / normal control)."""
    from ..models import (UNet2DConditionModel, UNet2DConditionConfig,
                          ControlNetModel, ControlNetConfig)
    from ..train.checkpoint import (latest_checkpoint,
                                    restore_checkpoint_lenient)

    unet_config = _load_json(os.path.join(pipeline_dir, "unet_config.json"))
    vae_config = _load_json(os.path.join(pipeline_dir, "vae_config.json"))
    ucfg = UNet2DConditionConfig.from_diffusers(unet_config)
    vcfg = AutoencoderKLConfig.from_diffusers(vae_config)
    unet = UNet2DConditionModel(ucfg, dtype=dtype)
    vae = AutoencoderKL(vcfg, dtype=dtype)

    key = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, ucfg.sample_size, ucfg.sample_size,
                     ucfg.in_channels), jnp.float32)
    res = ucfg.sample_size * vcfg.downsample_ratio
    ehs = jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.float32)
    k1, k2, k3 = jax.random.split(key, 3)
    out = {"unet": unet,
           "unet_params": jax.jit(unet.init)(k1, lat,
                                             jnp.zeros((1,), jnp.int32),
                                             ehs),
           "vae": vae,
           "vae_params": jax.jit(vae.init)(k2, jnp.zeros((1, res, res,
                                                          vcfg.in_channels),
                                                         jnp.float32))}

    cn_cfg_path = os.path.join(pipeline_dir, "controlnet_config.json")
    if os.path.exists(cn_cfg_path):
        ccfg = ControlNetConfig.from_diffusers(_load_json(cn_cfg_path))
        cn = ControlNetModel(ccfg, dtype=dtype)
        out["controlnet"] = cn
        out["controlnet_params"] = jax.jit(cn.init)(
            k3, lat, jnp.zeros((1,), jnp.int32), ehs, lat)

    ckpt = latest_checkpoint(pipeline_dir)
    if ckpt is None and not allow_random:
        raise FileNotFoundError(
            f"no checkpoint-* directory under {pipeline_dir!r}; pass "
            "allow_random=True to score random-initialized weights")
    if ckpt is not None:
        target = {"unet": jax.device_get(out["unet_params"]),
                  "unet_ema": jax.device_get(out["unet_params"]),
                  "vae": jax.device_get(out["vae_params"])}
        if "controlnet" in out:
            target["controlnet"] = jax.device_get(out["controlnet_params"])
        state = restore_checkpoint_lenient(ckpt, target)
        k = "unet_ema" if state.get("unet_ema") else "unet"
        missing = [n for n, sub in
                   (("unet/unet_ema", state.get(k)),
                    ("vae", state.get("vae")),
                    ("controlnet", state.get("controlnet")
                     if "controlnet" in out else True)) if not sub]
        if missing and not allow_random:
            raise FileNotFoundError(
                f"checkpoint {ckpt!r} holds no params for {missing}; pass "
                "allow_random=True to keep random weights for those")
        if state.get(k):
            out["unet_params"] = jax.device_put(state[k])
        if state.get("vae"):
            out["vae_params"] = jax.device_put(state["vae"])
        if state.get("controlnet"):
            out["controlnet_params"] = jax.device_put(state["controlnet"])

    te_dir = os.path.join(pipeline_dir, "text_encoder")
    if os.path.isdir(te_dir):
        from ..models.text_encoder import TextEncoder
        tok = os.path.join(pipeline_dir, "tokenizer")
        out["text_encoder"] = TextEncoder(
            pretrained_dir=te_dir,
            tokenizer_dir=tok if os.path.isdir(tok) else None)

    sched = os.path.join(pipeline_dir, "scheduler_config.json")
    if os.path.exists(sched):
        out["scheduler_config"] = _load_json(sched)
    return out
