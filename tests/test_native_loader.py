"""C++ data loader: decode parity vs PIL, prefetcher liveness, throughput."""

import os
import time

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image

from afldm_tpu.train.native_loader import (native_available, decode_one,
                                           NativeBatchLoader)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native toolchain unavailable")


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = (rng.random((80 + 8 * i, 100, 3)) * 255).astype(np.uint8)
        img = Image.fromarray(arr)
        img.save(d / f"img{i}.png")
        img.save(d / f"img{i}.jpg", quality=95)
    return str(d)


def test_decode_matches_jax_bilinear(image_dir):
    """The native resize implements the 2-tap half-pixel bilinear
    convention (same as jax.image.resize / torch antialias=False; PIL's
    BILINEAR is an area filter on downscale and differs by design)."""
    import jax
    import jax.numpy as jnp
    path = os.path.join(image_dir, "img0.png")
    R = 64
    got = decode_one(path, R)

    img = np.asarray(Image.open(path).convert("RGB"), np.float32)
    h, w = img.shape[:2]
    scale = R / min(w, h)
    tw, th = round(w * scale), round(h * scale)
    ref = np.asarray(jax.image.resize(jnp.asarray(img), (th, tw, 3),
                                      "bilinear"))
    left, top = (tw - R) // 2, (th - R) // 2
    ref = ref[top:top + R, left:left + R] / 127.5 - 1.0

    assert got.shape == ref.shape
    assert np.abs(got - ref).mean() < 0.01, np.abs(got - ref).mean()
    assert got.min() >= -1.0 and got.max() <= 1.0


def test_decode_jpeg(image_dir):
    got = decode_one(os.path.join(image_dir, "img1.jpg"), 48)
    assert got.shape == (48, 48, 3)
    assert np.isfinite(got).all()


def test_batch_loader_stream(image_dir):
    paths = [os.path.join(image_dir, f) for f in sorted(os.listdir(image_dir))]
    dl = NativeBatchLoader(paths, resolution=32, batch=4, threads=2, seed=0,
                           random_crop=True, random_flip=True)
    try:
        for _ in range(3):
            b = dl.next()
            assert b["input"].shape == (4, 32, 32, 3)
            assert np.isfinite(b["input"]).all()
            assert b["input"].std() > 0.1
    finally:
        dl.close()


def test_native_faster_than_pil(image_dir):
    paths = [os.path.join(image_dir, f) for f in sorted(os.listdir(image_dir))
             if f.endswith(".jpg")]
    R, n = 64, 30

    t0 = time.perf_counter()
    for i in range(n):
        decode_one(paths[i % len(paths)], R)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n):
        img = Image.open(paths[i % len(paths)]).convert("RGB")
        w, h = img.size
        s = R / min(w, h)
        img = img.resize((round(w * s), round(h * s)), Image.BILINEAR)
        np.asarray(img, np.float32)
    t_pil = time.perf_counter() - t0
    # single-threaded decode should at least keep pace with PIL; the win
    # comes from the prefetch pool, but a 5x regression would mean the
    # native path is broken
    assert t_native < t_pil * 5, (t_native, t_pil)
