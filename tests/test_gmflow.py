"""GMFlow port: forward shapes, bidirectional consistency, checkpoint
conversion (official key layout), and torch cross-checks of the matching /
upsampling math (VERDICT r1 item 7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from afldm_tpu.models.gmflow import (GMFlow, GMFlowConfig,
                                     global_correlation_softmax,
                                     convex_upsample, make_gmflow_flow_fn,
                                     load_gmflow_checkpoint)

TINY = GMFlowConfig(feature_channels=32, num_transformer_layers=2,
                    ffn_dim_expansion=2, upsample_factor=8, attn_splits=2)


@pytest.fixture(scope="module")
def gmflow_params():
    model = GMFlow(TINY)
    img = jnp.zeros((1, 64, 64, 3))
    return model, model.init(jax.random.PRNGKey(0), img, img)


def test_forward_shapes(gmflow_params, rng):
    model, params = gmflow_params
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)) * 255, jnp.float32)
    b = jnp.roll(a, 8, axis=2)
    flows = jax.jit(partial_apply(model, params))(a, b)
    assert flows.shape == (2, 64, 64, 2)  # bidir batched
    assert np.isfinite(np.asarray(flows)).all()


def partial_apply(model, params):
    def fn(a, b):
        return model.apply(params, a, b, pred_bidir_flow=True)
    return fn


def test_identical_images_symmetry(gmflow_params, rng):
    """For img0 == img1 the forward and backward flows are the same
    computation — they must agree exactly."""
    model, params = gmflow_params
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)) * 255, jnp.float32)
    flows = model.apply(params, a, a, pred_bidir_flow=True)
    np.testing.assert_allclose(np.asarray(flows[0]), np.asarray(flows[1]),
                               atol=1e-5)


def test_flow_fn_interface(gmflow_params, rng):
    model, params = gmflow_params
    fn = make_gmflow_flow_fn(params, TINY)
    a = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)) * 2 - 1, jnp.float32)
    b = jnp.roll(a, 4, axis=1)
    fwd, fwd_occ, bwd, bwd_occ = fn(a, b)
    assert fwd.shape == (1, 64, 64, 2) and fwd_occ.shape == (1, 64, 64, 1)
    assert bwd.shape == (1, 64, 64, 2) and bwd_occ.shape == (1, 64, 64, 1)


def test_checkpoint_conversion(gmflow_params, tmp_path):
    """A state dict in the OFFICIAL gmflow key layout fills the whole tree
    (structural converter test; the published checkpoint uses these keys)."""
    torch = pytest.importorskip("torch")
    from afldm_tpu.models.convert import flax_to_torch

    model, params = gmflow_params
    sd = flax_to_torch(params)
    # official key surface (github.com/haofeixu/gmflow state dict)
    for key in [
        "backbone.conv1.weight",
        "backbone.layer1.0.conv1.weight",
        "backbone.layer2.0.downsample.0.weight",
        "backbone.conv2.weight",
        "transformer.layers.0.self_attn.q_proj.weight",
        "transformer.layers.0.cross_attn_ffn.mlp.0.weight",
        "transformer.layers.0.cross_attn_ffn.norm2.weight",
        "feature_flow_attn.q_proj.weight",
        "upsampler.0.weight",
        "upsampler.2.weight",
    ]:
        assert key in sd, sorted(sd)[:10]

    ckpt = {"model": {k: torch.from_numpy(np.ascontiguousarray(v) + 1.0)
                      for k, v in sd.items()}}
    torch.save(ckpt, tmp_path / "gmflow.pth")
    new_params, report = load_gmflow_checkpoint(str(tmp_path / "gmflow.pth"),
                                                params)
    assert not report["unmatched_torch_keys"], \
        report["unmatched_torch_keys"][:5]
    assert not report["unfilled_flax_leaves"], \
        report["unfilled_flax_leaves"][:5]
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(new_params)):
        np.testing.assert_allclose(np.asarray(a) + 1.0, np.asarray(b),
                                   rtol=1e-6)


def test_global_correlation_matches_torch(rng):
    """The matching math against a literal torch transcription of the
    official global_correlation_softmax."""
    torch = pytest.importorskip("torch")
    N, H, W, C = 1, 6, 8, 16
    f0 = rng.standard_normal((N, H, W, C)).astype(np.float32)
    f1 = rng.standard_normal((N, H, W, C)).astype(np.float32)

    got = np.asarray(global_correlation_softmax(jnp.asarray(f0),
                                                jnp.asarray(f1)))

    t0 = torch.from_numpy(f0.transpose(0, 3, 1, 2).copy())
    t1 = torch.from_numpy(f1.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        corr = torch.matmul(t0.flatten(2).transpose(1, 2),
                            t1.flatten(2)) / (C ** 0.5)
        prob = torch.softmax(corr, dim=-1)
        yy, xx = torch.meshgrid(torch.arange(H, dtype=torch.float32),
                                torch.arange(W, dtype=torch.float32))
        grid = torch.stack([xx, yy], dim=-1).reshape(-1, 2)  # (HW, 2) xy
        corresp = torch.matmul(prob, grid)
        want = (corresp - grid[None]).reshape(N, H, W, 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convex_upsample_matches_torch(rng):
    """RAFT convex upsampling vs a literal torch unfold transcription."""
    torch = pytest.importorskip("torch")
    N, H, W, up = 1, 4, 6, 4
    flow = rng.standard_normal((N, H, W, 2)).astype(np.float32)
    mask = rng.standard_normal((N, H, W, up * up * 9)).astype(np.float32)

    got = np.asarray(convex_upsample(jnp.asarray(flow) * up,
                                     jnp.asarray(mask), up))

    ft = torch.from_numpy(flow.transpose(0, 3, 1, 2).copy())
    # both sides use the OFFICIAL channel layout (tap-major, 9*up*up) —
    # a straight NHWC->NCHW move, no permutation: this is what makes the
    # published checkpoint's upsampler weights convert 1:1
    mt = torch.from_numpy(mask.transpose(0, 3, 1, 2).copy())
    with torch.no_grad():
        m = mt.view(N, 1, 9, up, up, H, W)
        m = torch.softmax(m, dim=2)
        upf = torch.nn.functional.unfold(up * ft, (3, 3), padding=1)
        upf = upf.view(N, 2, 9, 1, 1, H, W)
        out = torch.sum(m * upf, dim=2)
        out = out.permute(0, 1, 4, 2, 5, 3)
        want = out.reshape(N, 2, up * H, up * W).numpy()
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)
