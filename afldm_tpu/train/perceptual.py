"""Perceptual loss for VAE training.

The reference uses lpips(vgg) (vae_trainer.py:107). A pretrained VGG cannot
be fetched in a zero-egress build, so the default here is a fixed
random-feature multi-scale conv metric (random-weight perceptual losses are
a known serviceable proxy); when a local torchvision VGG16 (or lpips-style)
checkpoint is available, ``load_lpips_vgg_features`` swaps in the real
filters. The loss is pure jnp either way (runs inside the jitted train
step)."""

import re

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
        # cache as numpy: building jnp arrays here would capture tracers if
        # the first call happens inside a jit trace (they'd leak into every
        # later trace via _DEFAULT_FILTERS)
        filters.append([w])  # one conv per stage
    return filters


_DEFAULT_FILTERS = None


def _filters():
    global _DEFAULT_FILTERS
    if _DEFAULT_FILTERS is None:
        _DEFAULT_FILTERS = _make_random_filters()
    return _DEFAULT_FILTERS


# torchvision vgg16.features conv indices per LPIPS slice
# (relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3)
_VGG16_STAGES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))

# lpips ScalingLayer constants (inputs in [-1, 1])
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lpips_vgg_features(path, set_default=True):
    """Load VGG16 conv filters from a local torch checkpoint and return the
    stage list for ``perceptual_loss``.

    Accepts a torchvision ``vgg16`` state dict (``features.N.weight``) or an
    lpips checkpoint's embedded backbone (``net.sliceK.N.weight`` — same
    torchvision indices). Biases load when present. With ``set_default``
    the loaded stages replace the random-feature proxy globally
    (ref vae_trainer.py:107: lpips.LPIPS(net='vgg'))."""
    from ..models.convert import load_torch_state_dict
    sd = load_torch_state_dict(path)

    idx_to_stage = {}
    for s, idxs in enumerate(_VGG16_STAGES):
        for i in idxs:
            idx_to_stage[i] = s

    found = {}
    for key, val in sd.items():
        val = np.asarray(val)
        m = re.search(r"(\d+)\.(weight|bias)$", key)
        if not m:
            continue
        idx = int(m.group(1))
        if idx not in idx_to_stage:
            continue
        if m.group(2) == "weight" and val.ndim != 4:
            continue
        found.setdefault(idx, {})[m.group(2)] = val

    missing = [i for i in idx_to_stage if "weight" not in found.get(i, {})]
    if missing:
        raise ValueError(
            f"{path} is not a VGG16 checkpoint: conv indices {missing} "
            "have no 4D weight")

    stages = []
    for idxs in _VGG16_STAGES:
        convs = []
        for i in idxs:
            w = found[i]["weight"].transpose(2, 3, 1, 0)  # OIHW -> HWIO
            b = found[i].get("bias")
            convs.append((w.astype(np.float32),
                          None if b is None else b.astype(np.float32)))
        stages.append(convs)

    if set_default:
        global _DEFAULT_FILTERS
        _DEFAULT_FILTERS = stages
    return stages


def _features(x, stages, max_pool=False):
    feats = []
    h = x
    for convs in stages:
        for conv in convs:
            if isinstance(conv, tuple):
                w, b = conv
            else:
                w, b = conv, None
            h = lax.conv_general_dilated(
                h, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if b is not None:
                h = h + b
            h = jax.nn.relu(h)
        # channel-normalize (LPIPS-style unit-norm features)
        h_n = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)
        feats.append(h_n)
        if max_pool:
            # torchvision VGG16 (lpips net='vgg') pools with MaxPool2d
            h = lax.reduce_window(h, -jnp.inf, lax.max, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID")
        else:
            h = lax.reduce_window(h, 0.0, lax.add, (1, 2, 2, 1),
                                  (1, 2, 2, 1), "VALID") / 4.0
    return feats


def _is_vgg(stages):
    return isinstance(stages[0][0], tuple)


def pooled_feature_vector(x, filters=None, grid=4):
    """Fixed feature descriptor for Frechet-distance metrics: the unit-
    normed multi-scale stage features of ``x`` (NHWC in [-1, 1]), each
    average-pooled to a (grid, grid) cell map and concatenated ->
    (N, sum(grid^2 * C_stage)). With the default random bank this is 896
    dims, deterministic (seed-0 filters), and model-independent — the
    cross-arm-comparable stand-in for Inception features in a zero-egress
    build (the role of the reference's FID feature extractor,
    af_libs/metric_utils.py:79-158)."""
    filters = filters or _filters()
    is_vgg = _is_vgg(filters)
    if is_vgg:
        x = (x - jnp.asarray(_LPIPS_SHIFT)) / jnp.asarray(_LPIPS_SCALE)
    feats = _features(x, filters, max_pool=is_vgg)
    cells = []
    for h in feats:
        n, hh, ww, c = h.shape
        g = min(grid, hh, ww)
        v = h.reshape(n, g, hh // g, g, ww // g, c).mean(axis=(2, 4))
        cells.append(v.reshape(n, g * g * c))
    return jnp.concatenate(cells, axis=-1)


def perceptual_loss(a, b, filters=None):
    """Sum over stages of mean squared feature distance; returns a scalar
    (per-batch mean, matching torch.sum(lpips)/bsz given lpips returns one
    value per sample)."""
    filters = filters or _filters()
    is_vgg = _is_vgg(filters)
    if is_vgg:
        shift = jnp.asarray(_LPIPS_SHIFT)
        scale = jnp.asarray(_LPIPS_SCALE)
        a = (a - shift) / scale
        b = (b - shift) / scale
    fa = _features(a, filters, max_pool=is_vgg)
    fb = _features(b, filters, max_pool=is_vgg)
    loss = 0.0
    for x, y in zip(fa, fb):
        loss = loss + jnp.mean((x - y) ** 2)
    return loss
