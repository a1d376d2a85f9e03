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
                  use_ema=True, dtype=jnp.float32):
    """Load a pipeline saved by a trainer's ``save_pipeline``."""
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
    if ckpt is not None:
        target = {"unet": jax.device_get(pipe.unet_params),
                  "unet_ema": jax.device_get(pipe.unet_params),
                  "vae": jax.device_get(pipe.vae_params)}
        # lenient restore adapts to what the dir actually holds (EMA off
        # saved as {}, vae-only / unet-only pipelines); it raises on real
        # corruption instead of silently returning random params
        state = restore_checkpoint_lenient(ckpt, target)
        key = "unet_ema" if use_ema and state.get("unet_ema") else "unet"
        if state.get(key):
            pipe.unet_params = jax.device_put(state[key])
        if state.get("vae"):
            pipe.vae_params = jax.device_put(state["vae"])
    return pipe
