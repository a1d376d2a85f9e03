"""Scheduler property tests (SURVEY.md §4: I2SB add_noise/step round-trip in
deterministic ODE mode, DDIM inversion/step inverse pair, spacing rules)."""

import numpy as np
import jax
import jax.numpy as jnp

from afldm_tpu.schedulers import DDIMScheduler, DDPMScheduler, I2SBScheduler

FFHQ_DDIM_CFG = dict(beta_end=0.0195, beta_schedule="scaled_linear",
                     beta_start=0.0015, clip_sample=False,
                     num_train_timesteps=1000, prediction_type="epsilon",
                     set_alpha_to_one=False, steps_offset=1,
                     timestep_spacing="leading")


def test_ddim_timestep_spacing_leading_offset():
    s = DDIMScheduler(**FFHQ_DDIM_CFG)
    ts = s.set_timesteps(50)
    # leading: arange(50)*20 reversed, +1 offset
    want = (np.arange(50) * 20)[::-1] + 1
    np.testing.assert_array_equal(ts, want)


def test_ddim_step_matches_formula(rng):
    s = DDIMScheduler(**FFHQ_DDIM_CFG)
    s.set_timesteps(50)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    t = 981
    prev, x0 = s.step(eps, t, x)

    a_t = s.alphas_cumprod[t]
    a_p = s.alphas_cumprod[t - 20]
    want_x0 = (np.asarray(x) - (1 - a_t) ** 0.5 * np.asarray(eps)) / a_t ** 0.5
    want = a_p ** 0.5 * want_x0 + (1 - a_p) ** 0.5 * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(prev), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x0), want_x0, rtol=1e-4, atol=1e-5)


def test_ddim_final_step_uses_final_alpha(rng):
    s = DDIMScheduler(**FFHQ_DDIM_CFG)
    s.set_timesteps(50)
    x = jnp.asarray(rng.standard_normal((1, 2, 2, 4)), jnp.float32)
    eps = jnp.zeros_like(x)
    prev, x0 = s.step(eps, 1, x)  # prev_t = -19 -> final_alpha = acp[0]
    a_t = s.alphas_cumprod[1]
    a_p = s.alphas_cumprod[0]  # set_alpha_to_one=False
    want = a_p ** 0.5 * (np.asarray(x) / a_t ** 0.5)
    np.testing.assert_allclose(np.asarray(prev), want, rtol=1e-4)


def test_ddim_inversion_step_inverts_step(rng):
    s = DDIMScheduler(**FFHQ_DDIM_CFG)
    s.set_timesteps(50)
    x_t = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)
    t = 501
    prev, _ = s.step(eps, t, x_t)
    back = s.inversion_step(eps, t - 20, t, prev)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x_t), rtol=1e-3,
                               atol=1e-4)


def test_ddim_add_noise():
    s = DDIMScheduler(**FFHQ_DDIM_CFG)
    x0 = jnp.ones((1, 2, 2, 1))
    noise = jnp.ones((1, 2, 2, 1)) * 2
    t = jnp.asarray([500])
    got = s.add_noise(x0, noise, t)
    a = s.alphas_cumprod[500]
    np.testing.assert_allclose(np.asarray(got),
                               a ** 0.5 * 1 + (1 - a) ** 0.5 * 2, rtol=1e-5)


def test_ddim_scan_sampler(rng):
    """Whole 10-step sampler inside one lax.scan (traced timesteps)."""
    s = DDIMScheduler(**FFHQ_DDIM_CFG)
    ts = jnp.asarray(s.set_timesteps(10))
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4)), jnp.float32)

    def fake_model(z, t):
        return 0.1 * z

    @jax.jit
    def sample(x):
        def body(carry, t):
            eps = fake_model(carry, t)
            nxt, _ = s.step(eps, t, carry)
            return nxt, None
        out, _ = jax.lax.scan(body, x, ts)
        return out

    got = sample(x)
    # python-loop reference
    ref = x
    for t in np.asarray(ts):
        eps = 0.1 * ref
        ref, _ = s.step(eps, int(t), ref)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_ddpm_add_noise_and_step_mean(rng):
    s = DDPMScheduler(num_train_timesteps=1000)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    noise = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
    xt = s.add_noise(x0, noise, jnp.asarray([999]))
    a = s.alphas_cumprod[999]
    np.testing.assert_allclose(
        np.asarray(xt), a ** 0.5 * np.asarray(x0) + (1 - a) ** 0.5 * np.asarray(noise),
        rtol=1e-4, atol=1e-5)
    # perfect eps at t recovers x0 in the posterior-mean limit t->0
    s.set_timesteps(1000)
    eps_perfect = noise
    prev, x0_hat = s.step(eps_perfect, 0, s.add_noise(x0, noise, jnp.asarray([0])))
    np.testing.assert_allclose(np.asarray(x0_hat), np.clip(np.asarray(x0), -1, 1),
                               rtol=1e-3, atol=1e-4)


def test_i2sb_tables_match_reference_construction():
    s = I2SBScheduler(num_train_timesteps=1000, beta_start=0.0001,
                      beta_end=0.02, beta_schedule="linear")
    betas = np.linspace(0.0001, 0.02, 1000, dtype=np.float32)
    std_fwd = np.sqrt(np.cumsum(betas))
    std_bwd = np.sqrt(np.cumsum(betas[::-1])[::-1])
    np.testing.assert_allclose(s.std_fwd, std_fwd, rtol=1e-5)
    np.testing.assert_allclose(s.std_bwd, std_bwd, rtol=1e-5)
    denom = std_fwd ** 2 + std_bwd ** 2
    np.testing.assert_allclose(s.mu_x0, std_bwd ** 2 / denom, rtol=1e-5)
    np.testing.assert_allclose(s.mu_x1, std_fwd ** 2 / denom, rtol=1e-5)


def test_i2sb_label_add_noise_roundtrip(rng):
    s = I2SBScheduler()
    x0 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((2, 4, 4, 4)), jnp.float32)
    t = jnp.asarray([700, 300])
    xt = s.add_noise(x0, x1, t, is_ode=True)
    label = s.compute_label(t, x0, xt)
    # pred_x0 = xt - std_fwd * label == x0 exactly
    std = s.std_fwd[np.asarray(t)][:, None, None, None]
    np.testing.assert_allclose(np.asarray(xt) - std * np.asarray(label),
                               np.asarray(x0), rtol=1e-4, atol=1e-5)


def test_i2sb_ode_sampler_recovers_x0_with_perfect_model(rng):
    """ODE-mode denoising with the perfect label network recovers x0 from
    the bridge start x1 (deterministic; SURVEY.md §4)."""
    s = I2SBScheduler(clip_sample=False)
    x0 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)) * 0.3, jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 4, 4, 4)) * 0.3, jnp.float32)
    ts = s.set_timesteps(20)

    x = s.add_noise(x0, x1, jnp.asarray([int(ts[0])]), is_ode=True)
    for i, t in enumerate(ts):
        prev_t = int(ts[i + 1]) if i + 1 < len(ts) else -1
        label = s.compute_label(jnp.asarray([int(t)]), x0, x)
        x, pred_x0 = s.step(label, int(t), prev_t, x, is_ode=True)
        np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(x0),
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), rtol=1e-3,
                               atol=1e-4)


def test_i2sb_custom_timesteps_validation():
    s = I2SBScheduler()
    import pytest
    with pytest.raises(ValueError):
        s.set_timesteps(timesteps=[10, 20])  # ascending -> invalid
    with pytest.raises(ValueError):
        s.set_timesteps(timesteps=[1000, 500])  # starts too high
    ts = s.set_timesteps(timesteps=[900, 500, 100])
    np.testing.assert_array_equal(ts, [900, 500, 100])
