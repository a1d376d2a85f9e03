"""Sampler service: microbatching, seed determinism, HTTP surface."""

import base64
import io
import json
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models import (UNet2DModel, UNet2DConfig, AutoencoderKL,
                              AutoencoderKLConfig)
from afldm_tpu.schedulers import DDIMScheduler
from afldm_tpu.pipelines import LDMPipeline
from afldm_tpu.serve import SamplerService, serve


@pytest.fixture(scope="module")
def tiny_pipeline():
    ucfg = UNet2DConfig(
        sample_size=8, in_channels=4, out_channels=4,
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        block_out_channels=(8, 16), layers_per_block=1,
        attention_head_dim=8, norm_num_groups=4, alias_free=True)
    vcfg = AutoencoderKLConfig(block_out_channels=(8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               sample_size=16, scaling_factor=0.6)
    unet = UNet2DModel(ucfg)
    vae = AutoencoderKL(vcfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    up = unet.init(k1, jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32))
    vp = vae.init(k2, jnp.zeros((1, 16, 16, 3)))
    sched = DDIMScheduler(num_train_timesteps=100,
                          beta_schedule="scaled_linear", beta_start=0.0015,
                          beta_end=0.0195, clip_sample=False)
    return LDMPipeline(vae, vp, unet, up, sched, scaling_factor=0.6)


def test_sample_and_determinism(tiny_pipeline):
    svc = SamplerService(tiny_pipeline, batch_window_ms=1.0)
    try:
        a = svc.sample(num_images=1, num_inference_steps=2, seed=7)
        b = svc.sample(num_images=1, num_inference_steps=2, seed=7)
        c = svc.sample(num_images=1, num_inference_steps=2, seed=8)
        assert a["images"].shape == (1, 16, 16, 3)
        np.testing.assert_array_equal(a["images"], b["images"])
        assert np.abs(a["images"] - c["images"]).max() > 0
    finally:
        svc.close()


def test_concurrent_requests_batch(tiny_pipeline):
    """Concurrent callers share device dispatches and results stay
    per-seed correct."""
    svc = SamplerService(tiny_pipeline, batch_window_ms=200.0, max_batch=8)
    try:
        # single warm-up compiles the bucket so the batched window isn't
        # serialized by compilation
        ref = {s: svc.sample(1, 2, seed=s)["images"] for s in range(4)}
        base_batches = svc.stats["batches"]
        with ThreadPoolExecutor(max_workers=4) as ex:
            futs = {s: ex.submit(svc.sample, 1, 2, s) for s in range(4)}
            out = {s: f.result(timeout=120) for s, f in futs.items()}
        for s in range(4):
            np.testing.assert_allclose(out[s]["images"], ref[s], atol=1e-5)
        made = svc.stats["batches"] - base_batches
        assert made < 4, f"no batching happened ({made} dispatches for 4)"
        assert any(out[s]["batched_with"] > 0 for s in range(4))
    finally:
        svc.close()


def test_http_surface(tiny_pipeline):
    server, svc = serve(tiny_pipeline, port=0, batch_window_ms=1.0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert json.loads(r.read())["ok"]

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sample",
            data=json.dumps({"num_images": 2, "num_inference_steps": 2,
                             "seed": 1}).encode(),
            method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            out = json.loads(r.read())
        assert out["shape"] == [2, 16, 16, 3]
        arr = np.load(io.BytesIO(base64.b64decode(out["images_b64"])))
        assert arr.shape == (2, 16, 16, 3) and np.isfinite(arr).all()

        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1
    finally:
        server.shutdown()
        svc.close()
