"""SD-family model + pipeline tests on tiny random-weight configs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import (UNet2DConditionModel, UNet2DConditionConfig,
                              ControlNetModel, ControlNetConfig,
                              AutoencoderKL, AutoencoderKLConfig)
from afldm_tpu.schedulers import DDIMScheduler
from afldm_tpu.pipelines import (NormControlPipeline,
                                 VideoEquivEditingPipeline,
                                 ImageInterpolationPipeline)

SD_CFG = UNet2DConditionConfig(
    sample_size=8, block_out_channels=(16, 32),
    down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
    layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
    norm_num_groups=8, alias_free=True)

VAE_CFG = AutoencoderKLConfig(
    block_out_channels=(8, 8, 8, 8), layers_per_block=1, latent_channels=4,
    norm_num_groups=4, sample_size=64, scaling_factor=0.6, alias_free=True,
    down_filtered_act=(False, True, True, True),
    up_filtered_act=(True, True, True, False), up_rescale=(True, True, True))

DDIM_CFG = dict(beta_end=0.0195, beta_schedule="scaled_linear",
                beta_start=0.0015, clip_sample=False,
                num_train_timesteps=1000, set_alpha_to_one=False,
                steps_offset=1, timestep_spacing="leading")


class _ZeroTextEncoder:
    def encode(self, prompts):
        return jnp.zeros((len(prompts), 7, 16), jnp.float32)


@pytest.fixture(scope="module")
def sd_parts():
    key = jax.random.PRNGKey(0)
    unet = UNet2DConditionModel(SD_CFG)
    vae = AutoencoderKL(VAE_CFG)
    z = jnp.zeros((1, 8, 8, 4))
    ehs = jnp.zeros((1, 7, 16))
    up = unet.init(key, z, jnp.asarray([0]), ehs)
    vp = vae.init(key, jnp.zeros((1, 64, 64, 3)))
    return unet, up, vae, vp


def test_sd_unet_cfg_batching(sd_parts):
    unet, up, _, _ = sd_parts
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    ehs = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    out, kv = unet.apply(up, z, jnp.asarray([10, 10]), ehs)
    # self-attns: 1 (down) + 1 (mid) + 2 (up block with 2 resnets) = 4
    assert out.shape == z.shape and len(kv) == 4


def test_controlnet_residual_path(sd_parts):
    unet, up, _, _ = sd_parts
    cn_cfg = ControlNetConfig.from_unet_config(SD_CFG)
    cn = ControlNetModel(cn_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ehs = jnp.zeros((1, 7, 16))
    cp = cn.init(jax.random.PRNGKey(3), z, jnp.asarray([0]), ehs, z)
    dres, mres, _ = cn.apply(cp, z, jnp.asarray([999]), ehs, z)
    base, _ = unet.apply(up, z, jnp.asarray([999]), ehs)
    out, _ = unet.apply(up, z, jnp.asarray([999]), ehs,
                        down_block_residuals=dres, mid_block_residual=mres)
    # zero-initialized controlnet is exactly transparent
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=0)

    # nonzero residuals change the output
    dres2 = tuple(d + 0.1 for d in dres)
    out2, _ = unet.apply(up, z, jnp.asarray([999]), ehs,
                         down_block_residuals=dres2,
                         mid_block_residual=mres)
    assert np.abs(np.asarray(out2) - np.asarray(base)).max() > 1e-4


def test_norm_control_pipeline(sd_parts):
    unet, up, vae, vp = sd_parts
    cn_cfg = ControlNetConfig.from_unet_config(SD_CFG)
    cn = ControlNetModel(cn_cfg)
    z = jnp.zeros((1, 8, 8, 4))
    cp = cn.init(jax.random.PRNGKey(3), z, jnp.asarray([0]),
                 jnp.zeros((1, 7, 16)), z)
    pipe = NormControlPipeline(vae, vp, unet, up, cn, cp,
                               DDIMScheduler(**DDIM_CFG),
                               text_encoder=_ZeroTextEncoder())
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3)) * 0.3
    res = pipe(img, num_shift_steps=3)
    assert res.normals.shape == (4, 64, 64, 3)
    assert np.isfinite(res.psnrs).all() and res.psnrs.shape == (3,)


def test_video_editing_pipeline(sd_parts):
    unet, up, vae, vp = sd_parts
    pipe = VideoEquivEditingPipeline(vae, vp, unet, up,
                                     DDIMScheduler(**DDIM_CFG),
                                     text_encoder=_ZeroTextEncoder())
    frames = jax.random.normal(jax.random.PRNGKey(5), (3, 64, 64, 3)) * 0.3
    out = pipe(frames, "a prompt", strength=0.5, num_inference_steps=4,
               guidance_scale=2.0, key=jax.random.PRNGKey(6))
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(out).all()
    # guidance_rescale (ref rescale_noise_cfg, :52-65): 0.0 is the
    # baseline; a nonzero value changes the output and stays finite.
    # Needs cond != uncond embeddings (with the zero encoder the CFG
    # direction is zero and the rescale is a mathematical no-op).
    class _DistinctTextEncoder:
        def encode(self, prompts):
            dim = unet.config.cross_attention_dim
            return jnp.stack([
                jax.random.normal(
                    jax.random.PRNGKey(len(p) + 1), (77, dim)) * 0.1
                for p in prompts])

    pipe2 = VideoEquivEditingPipeline(vae, vp, unet, up,
                                      DDIMScheduler(**DDIM_CFG),
                                      text_encoder=_DistinctTextEncoder())
    out0 = pipe2(frames, "a prompt", strength=0.5, num_inference_steps=4,
                 guidance_scale=2.0, guidance_rescale=0.0,
                 key=jax.random.PRNGKey(6))
    out_r = pipe2(frames, "a prompt", strength=0.5, num_inference_steps=4,
                  guidance_scale=2.0, guidance_rescale=0.7,
                  key=jax.random.PRNGKey(6))
    assert np.isfinite(out_r).all()
    assert float(np.abs(out_r - out0).max()) > 1e-6


def test_video_editing_frame_sharding(sd_parts):
    """Frame-axis (sequence) sharding over the mesh 'data' axis must
    reproduce the single-device joint denoise bit-for-bit at f32 tolerance
    (SURVEY.md §5.7: frames only couple through the replicated frame-0 KV
    trajectory)."""
    from jax.sharding import Mesh

    unet, up, vae, vp = sd_parts
    # 6 frames on an 8-way 'data' axis: NOT divisible — exercises the
    # pad-to-shard-multiple path (GSPMD rejects ragged shards; the
    # pipeline pads by repeating the last frame and slices back)
    frames = jax.random.normal(jax.random.PRNGKey(5), (6, 64, 64, 3)) * 0.3

    def run(mesh):
        pipe = VideoEquivEditingPipeline(vae, vp, unet, up,
                                         DDIMScheduler(**DDIM_CFG),
                                         text_encoder=_ZeroTextEncoder(),
                                         mesh=mesh)
        return pipe(frames, "a prompt", strength=0.5,
                    num_inference_steps=3, guidance_scale=2.0,
                    key=jax.random.PRNGKey(6))

    base = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    sharded = run(mesh)
    assert sharded.shape == (6, 64, 64, 3)
    np.testing.assert_allclose(sharded, base, atol=2e-5)


def test_video_editing_inversion_path(sd_parts):
    unet, up, vae, vp = sd_parts
    pipe = VideoEquivEditingPipeline(vae, vp, unet, up,
                                     DDIMScheduler(**DDIM_CFG),
                                     text_encoder=_ZeroTextEncoder())
    frames = jax.random.normal(jax.random.PRNGKey(7), (2, 64, 64, 3)) * 0.3
    out = pipe(frames, "p", strength=0.5, num_inference_steps=4,
               use_inversion=True, key=jax.random.PRNGKey(8))
    assert out.shape == (2, 64, 64, 3) and np.isfinite(out).all()


def test_interpolation_pipeline(sd_parts):
    unet, up, vae, vp = sd_parts
    from afldm_tpu.shift.simple_flow import predict_flow
    pipe = ImageInterpolationPipeline(vae, vp, unet, up,
                                      DDIMScheduler(**DDIM_CFG),
                                      text_encoder=_ZeroTextEncoder(),
                                      flow_fn=predict_flow)
    img0 = jax.random.normal(jax.random.PRNGKey(9), (1, 64, 64, 3)) * 0.3
    img1 = jnp.roll(img0, 8, axis=2)
    out = pipe(img0, img1, num_frames=3, num_inference_steps=2,
               key=jax.random.PRNGKey(10))
    assert out.shape == (3, 64, 64, 3)
    assert np.isfinite(out).all()


def test_interpolation_frame_sharding(sd_parts):
    """Frame-axis sharding of the joint interp denoise over the mesh
    'data' axis must reproduce the single-device result (frames couple
    only through the two replicated endpoint KV trajectories)."""
    from jax.sharding import Mesh
    from afldm_tpu.shift.simple_flow import predict_flow

    unet, up, vae, vp = sd_parts
    img0 = jax.random.normal(jax.random.PRNGKey(13), (1, 64, 64, 3)) * 0.3
    img1 = jnp.roll(img0, 8, axis=2)

    def run(mesh):
        pipe = ImageInterpolationPipeline(vae, vp, unet, up,
                                          DDIMScheduler(**DDIM_CFG),
                                          text_encoder=_ZeroTextEncoder(),
                                          flow_fn=predict_flow, mesh=mesh)
        # 5 frames on an 8-way 'data' axis: NOT divisible — exercises the
        # pad-to-shard-multiple path (the reference default of 17 frames
        # is also never divisible by 2/4/8 devices)
        return pipe(img0, img1, num_frames=5, num_inference_steps=2,
                    key=jax.random.PRNGKey(14))

    base = run(None)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8, 1),
                ("data", "model"))
    sharded = run(mesh)
    assert sharded.shape == (5, 64, 64, 3)
    np.testing.assert_allclose(sharded, base, atol=2e-5)


def test_interpolation_endpoint_consistency(sd_parts):
    """alpha=0 frame uses kv0 only; its trajectory should match a plain
    STORE denoise of the same starting noise."""
    unet, up, vae, vp = sd_parts
    from afldm_tpu.shift.simple_flow import predict_flow
    pipe = ImageInterpolationPipeline(vae, vp, unet, up,
                                      DDIMScheduler(**DDIM_CFG),
                                      text_encoder=_ZeroTextEncoder(),
                                      flow_fn=predict_flow)
    img0 = jax.random.normal(jax.random.PRNGKey(11), (1, 64, 64, 3)) * 0.3
    img1 = jnp.roll(img0, 4, axis=1)
    out = pipe(img0, img1, num_frames=2, num_inference_steps=2,
               key=jax.random.PRNGKey(12), use_slerp=False)
    assert np.isfinite(out).all()


def test_norm_control_multistep(sd_parts):
    """The non-YOSO branch (ref normal_control_pipeline.py:389-396):
    multi-step ControlNet denoise with CFG and guess-mode variants."""
    unet, up, vae, vp = sd_parts
    cn_cfg = ControlNetConfig.from_unet_config(SD_CFG)
    cn = ControlNetModel(cn_cfg)
    z = jnp.zeros((1, 8, 8, 4))
    cp = cn.init(jax.random.PRNGKey(3), z, jnp.asarray([0]),
                 jnp.zeros((1, 7, 16)), z)
    # non-transparent controlnet so residuals actually act
    cp = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim >= 1 else a, cp)
    pipe = NormControlPipeline(vae, vp, unet, up, cn, cp,
                               DDIMScheduler(**DDIM_CFG),
                               text_encoder=_ZeroTextEncoder())
    img = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 3)) * 0.3
    key = jax.random.PRNGKey(7)

    res = pipe(img, num_shift_steps=2, is_yoso=False, key=key,
               num_inference_steps=3)
    assert res.normals.shape == (3, 64, 64, 3)
    assert np.isfinite(res.normals).all() and np.isfinite(res.psnrs).all()

    # with the zero text encoder, cond == uncond embeds, so the CFG combine
    # eu + gs*(ec - eu) must equal the plain path bit-for-bit in exact math
    # (tolerance for the separate compile)
    res_cfg = pipe(img, num_shift_steps=2, is_yoso=False, key=key,
                   num_inference_steps=3, guidance_scale=5.0)
    np.testing.assert_allclose(res_cfg.normals, res.normals, atol=1e-4)

    # guess mode zeroes the uncond-half residuals and ramps the scales —
    # must differ from the full-CFG run and stay finite
    res_guess = pipe(img, num_shift_steps=2, is_yoso=False, key=key,
                     num_inference_steps=3, guidance_scale=5.0,
                     guess_mode=True)
    assert np.isfinite(res_guess.normals).all()
    assert np.abs(res_guess.normals - res_cfg.normals).max() > 1e-4


def test_controlnet_guess_mode_ramp(sd_parts):
    """Guess-mode residual scaling is the logspace 0.1 -> 1.0 ramp applied
    per skip (ref models/my_controlnet.py:212-231)."""
    _, _, _, _ = sd_parts
    cn_cfg = ControlNetConfig.from_unet_config(SD_CFG)
    cn = ControlNetModel(cn_cfg)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ehs = jnp.zeros((1, 7, 16))
    cp = cn.init(jax.random.PRNGKey(3), z, jnp.asarray([0]), ehs, z)
    cp = jax.tree_util.tree_map(
        lambda a: a + 0.01 if a.ndim >= 1 else a, cp)
    d0, m0, _ = cn.apply(cp, z, jnp.asarray([999]), ehs, z)
    d1, m1, _ = cn.apply(cp, z, jnp.asarray([999]), ehs, z,
                         guess_mode=True)
    ramp = np.logspace(-1, 0, len(d0) + 1)
    for i, (a, b) in enumerate(zip(d0, d1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a) * ramp[i],
                                   rtol=1e-5)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0) * ramp[-1],
                               rtol=1e-5)


def test_video_editing_zero_step_strength_raises(sd_parts):
    """strength small enough to truncate to zero denoise steps must raise
    (the SDEdit path would otherwise IndexError on an empty timestep
    array; the inversion path would silently return un-edited frames)."""
    import pytest
    unet, up, vae, vp = sd_parts
    pipe = VideoEquivEditingPipeline(vae, vp, unet, up,
                                     DDIMScheduler(**DDIM_CFG),
                                     text_encoder=_ZeroTextEncoder())
    frames = jax.random.normal(jax.random.PRNGKey(3), (2, 64, 64, 3)) * 0.3
    with pytest.raises(ValueError, match="ZERO denoise steps"):
        pipe(frames, "p", strength=0.01, num_inference_steps=4,
             key=jax.random.PRNGKey(4))
