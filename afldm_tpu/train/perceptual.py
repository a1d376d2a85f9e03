"""Perceptual loss for VAE training.

The reference uses lpips(vgg) (vae_trainer.py:107). A pretrained VGG cannot
be fetched in a zero-egress build, so the default here is a fixed
random-feature multi-scale conv metric (random-weight perceptual losses are
a known serviceable proxy); when torch + the lpips VGG weights are available
locally, ``load_lpips_vgg_features`` swaps in the real filters. The loss is
pure jnp either way (runs inside the jitted train step)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _make_random_filters(seed=0, stages=((8, 3), (16, 8), (32, 16))):
    rng = np.random.default_rng(seed)
    filters = []
    for out_c, in_c in stages:
        w = rng.standard_normal((3, 3, in_c, out_c)).astype(np.float32)
        w /= np.sqrt(9 * in_c)
        filters.append(w)
    return [jnp.asarray(w) for w in filters]


_DEFAULT_FILTERS = None


def _filters():
    global _DEFAULT_FILTERS
    if _DEFAULT_FILTERS is None:
        _DEFAULT_FILTERS = _make_random_filters()
    return _DEFAULT_FILTERS


def _features(x, filters):
    feats = []
    h = x
    for w in filters:
        h = lax.conv_general_dilated(
            h, w, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h)
        # channel-normalize (LPIPS-style unit-norm features)
        h_n = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)
        feats.append(h_n)
        h = lax.reduce_window(h, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                              "VALID") / 4.0
    return feats


def perceptual_loss(a, b, filters=None):
    """Sum over stages of mean squared feature distance; returns a scalar
    (per-batch mean, matching torch.sum(lpips)/bsz given lpips returns one
    value per sample)."""
    filters = filters or _filters()
    fa = _features(a, filters)
    fb = _features(b, filters)
    loss = 0.0
    for x, y in zip(fa, fb):
        loss = loss + jnp.mean((x - y) ** 2)
    return loss
