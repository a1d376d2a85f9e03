"""End-to-end pipeline tests on tiny random-weight models (SURVEY.md §4)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import (UNet2DModel, UNet2DConfig, AutoencoderKL,
                              AutoencoderKLConfig)
from afldm_tpu.schedulers import DDIMScheduler, I2SBScheduler
from afldm_tpu.pipelines import (LDMPipeline, I2SBLDMPipeline,
                                 shift_equivariance_eval)


UNET_CFG = UNet2DConfig(
    sample_size=8, in_channels=4, out_channels=4,
    down_block_types=("AttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "AttnUpBlock2D"),
    block_out_channels=(32, 64), layers_per_block=1,
    attention_head_dim=8, norm_num_groups=8, alias_free=True)

VAE_CFG = AutoencoderKLConfig(
    block_out_channels=(16, 16, 16, 16), layers_per_block=1,
    latent_channels=4, norm_num_groups=8, sample_size=64,
    scaling_factor=0.6, alias_free=True,
    down_filtered_act=(False, True, True, True),
    up_filtered_act=(True, True, True, False),
    up_rescale=(True, True, True))

DDIM_CFG = dict(beta_end=0.0195, beta_schedule="scaled_linear",
                beta_start=0.0015, clip_sample=False,
                num_train_timesteps=1000, set_alpha_to_one=False,
                steps_offset=1, timestep_spacing="leading")


@pytest.fixture(scope="module")
def pipeline():
    key = jax.random.PRNGKey(0)
    unet = UNet2DModel(UNET_CFG)
    vae = AutoencoderKL(VAE_CFG)
    z = jnp.zeros((1, 8, 8, 4))
    x = jnp.zeros((1, 64, 64, 3))
    up = unet.init(key, z, jnp.asarray([0]))
    vp = vae.init(key, x)
    return LDMPipeline(vae, vp, unet, up, DDIMScheduler(**DDIM_CFG))


def test_ldm_generation(pipeline):
    img = pipeline(batch_size=2, key=jax.random.PRNGKey(1),
                   num_inference_steps=4)
    assert img.shape == (2, 64, 64, 3)
    assert img.min() >= 0 and img.max() <= 1


def test_scan_denoise_matches_python_loop(pipeline):
    """The lax.scan denoiser must equal a step-by-step python loop."""
    key = jax.random.PRNGKey(2)
    lat = jax.random.normal(key, (1, 8, 8, 4))
    out_scan, kv = pipeline.denoise(lat, 4, collect_kv=True)

    s = pipeline.scheduler
    ts = s.set_timesteps(4)
    x = lat
    for t in ts:
        eps, _ = pipeline.unet.apply(pipeline.unet_params, x,
                                     jnp.asarray([int(t)]))
        x, _ = s.step(eps, int(t), x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x),
                               rtol=2e-3, atol=2e-4)
    # kv trajectory has steps as leading dim
    assert kv[0].shape[0] == 4


def test_cfa_load_trajectory_reproduces_store(pipeline):
    """Denoising the same latent under LOAD of its own trajectory must equal
    the STORE pass (self-consistency of the cache plumbing)."""
    lat = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    out_store, kv = pipeline.denoise(lat, 4, collect_kv=True)
    out_load, _ = pipeline.denoise(lat, 4, kv_traj=kv)
    np.testing.assert_allclose(np.asarray(out_store), np.asarray(out_load),
                               atol=1e-5)


def test_cfa_batch_broadcast(pipeline):
    """A batch of shifted latents under a batch-1 KV cache must equal
    per-item runs (the batched shift sweep optimization)."""
    key = jax.random.PRNGKey(4)
    lat = jax.random.normal(key, (1, 8, 8, 4))
    _, kv = pipeline.denoise(lat, 2, collect_kv=True)

    batch = jnp.concatenate([lat, jnp.roll(lat, 1, axis=2),
                             jnp.roll(lat, 2, axis=2)], axis=0)
    out_b, _ = pipeline.denoise(batch, 2, kv_traj=kv)
    for i in range(3):
        out_i, _ = pipeline.denoise(batch[i:i + 1], 2, kv_traj=kv)
        np.testing.assert_allclose(np.asarray(out_b[i]),
                                   np.asarray(out_i[0]), atol=1e-4)


def test_ddim_inversion_matches_reference_loop(pipeline):
    """The scan-based inversion must equal the reference's python loop
    (ldm_pipeline.py:133-160): ascending timesteps, alpha_prev from the
    previous element (final_alpha for the first)."""
    lat = 0.3 * jax.random.normal(jax.random.PRNGKey(5), (1, 8, 8, 4))
    got = pipeline.ddim_inversion(lat, 4)

    s = pipeline.scheduler
    ts = list(reversed(s.set_timesteps(4)))
    x = lat
    for i, t in enumerate(ts):
        a_t = s.alphas_cumprod[t]
        a_p = (s.alphas_cumprod[ts[i - 1]] if i > 0
               else s.final_alpha_cumprod)
        mu, mu_prev = a_t ** 0.5, a_p ** 0.5
        sigma, sigma_prev = (1 - a_t) ** 0.5, (1 - a_p) ** 0.5
        eps, _ = pipeline.unet.apply(pipeline.unet_params, x,
                                     jnp.asarray([int(t)]))
        x0 = (x - sigma_prev * eps) / mu_prev
        x = mu * x0 + sigma * eps
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=2e-3,
                               atol=2e-4)


def test_shift_eval_runs_and_masks(pipeline):
    res = shift_equivariance_eval(pipeline, key=jax.random.PRNGKey(6),
                                  num_inference_steps=2, num_shift_steps=3)
    assert res.psnrs.shape == (3,)
    assert res.outputs.shape == (3, 64, 64, 3)
    assert np.isfinite(res.psnrs).all()


def test_shift_eval_batched_equals_sequential(pipeline):
    r1 = shift_equivariance_eval(pipeline, key=jax.random.PRNGKey(7),
                                 num_inference_steps=2, num_shift_steps=2,
                                 batch_shifts=True)
    r2 = shift_equivariance_eval(pipeline, key=jax.random.PRNGKey(7),
                                 num_inference_steps=2, num_shift_steps=2,
                                 batch_shifts=False)
    np.testing.assert_allclose(r1.psnrs, r2.psnrs, atol=0.05)


def test_i2sb_pipeline(pipeline):
    i2sb = I2SBLDMPipeline(pipeline.vae, pipeline.vae_params,
                           pipeline.unet, pipeline.unet_params,
                           I2SBScheduler(clip_sample=False))
    lq = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 3)) * 0.2, jnp.float32)
    out = i2sb(lq, num_inference_steps=4)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_shift_eval_rejects_batched_input(pipeline):
    """The protocol is per-image (shifts become the batch axis); a
    multi-image latent would silently misalign with the batch-broadcast
    KV cache and the per-shift PSNR indexing, so it must raise."""
    import pytest
    lat2 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 2))
    with pytest.raises(ValueError, match="ONE image"):
        shift_equivariance_eval(pipeline, init_latent=lat2,
                                num_inference_steps=2, num_shift_steps=2)
