"""Flow estimator tests: recovers known translations, consistency masks."""

import numpy as np
import jax.numpy as jnp

from afldm_tpu.shift.simple_flow import estimate_flow, predict_flow
from afldm_tpu.ops import lpf_rfft


def _smooth_image(rng, h=64, w=64):
    # textured but bandlimited (blocky images hit the aperture problem)
    noise = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    img = lpf_rfft(noise, 0.25)
    return jnp.tanh(img * 2.0)


def test_recovers_integer_translation(rng):
    img0 = _smooth_image(rng)
    img1 = jnp.roll(img0, (3, -2), axis=(1, 2))
    flow = estimate_flow(img0, img1)
    # interior flow should approximate (3, -2) (borders wrap)
    inner = np.asarray(flow)[0, 16:-16, 16:-16]
    assert abs(inner[..., 0].mean() - 3) < 0.7, inner[..., 0].mean()
    assert abs(inner[..., 1].mean() + 2) < 0.7, inner[..., 1].mean()


def test_zero_flow_for_identical_images(rng):
    img0 = _smooth_image(rng)
    flow = estimate_flow(img0, img0)
    assert np.abs(np.asarray(flow)).max() < 0.1


def test_predict_flow_interface(rng):
    img0 = _smooth_image(rng)
    img1 = jnp.roll(img0, 2, axis=2)
    fwd, fwd_occ, bwd, bwd_occ = predict_flow(img0, img1)
    assert fwd.shape == (1, 64, 64, 2) and fwd_occ.shape == (1, 64, 64, 1)
    # translation: flows consistent, few occlusions in the interior
    occ_inner = np.asarray(fwd_occ)[0, 16:-16, 16:-16]
    assert occ_inner.mean() < 0.2
