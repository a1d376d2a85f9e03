"""Utility tests: misc helpers, training stats, IO round trip."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from afldm_tpu.utils import (assert_shape, InfiniteSampler, params_count,
                             Collector, tensor_to_images,
                             save_gif_from_tensors)


def test_assert_shape_wildcards():
    x = jnp.zeros((2, 8, 8, 3))
    assert_shape(x, (None, 8, 8, 3))
    with pytest.raises(AssertionError):
        assert_shape(x, (None, 4, 8, 3))
    with pytest.raises(AssertionError):
        assert_shape(x, (2, 8, 8))


def test_infinite_sampler_sharding():
    s0 = InfiniteSampler(10, rank=0, num_replicas=2, seed=1)
    s1 = InfiniteSampler(10, rank=1, num_replicas=2, seed=1)
    it0, it1 = iter(s0), iter(s1)
    a = [next(it0) for _ in range(20)]
    b = [next(it1) for _ in range(20)]
    assert all(0 <= i < 10 for i in a + b)
    # both ranks together cover the dataset
    assert set(a + b) == set(range(10))


def test_collector_stats():
    c = Collector()
    c.report("loss", jnp.asarray([1.0, 2.0, 3.0]))
    c.report("loss", jnp.asarray([4.0]))
    assert c.num("loss") == 4
    np.testing.assert_allclose(c.mean("loss"), 2.5)
    np.testing.assert_allclose(c.std("loss"), np.std([1, 2, 3, 4]),
                               rtol=1e-5)


def test_params_count():
    tree = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(5)}}
    assert params_count(tree) == 11


def test_gif_roundtrip(tmp_path, rng):
    frames = [jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 3)), jnp.float32)
              for _ in range(3)]
    p = tmp_path / "t.gif"
    save_gif_from_tensors(frames, str(p))
    assert p.exists() and p.stat().st_size > 0
    imgs = tensor_to_images(frames[0])
    assert len(imgs) == 2 and imgs[0].dtype == np.uint8


def test_feature_stats_mean_cov(rng):
    from afldm_tpu.utils.metric_utils import FeatureStats
    x = rng.standard_normal((500, 8)).astype(np.float32)
    fs = FeatureStats(capture_mean_cov=True)
    for i in range(0, 500, 100):
        fs.append(x[i:i + 100])
    mean, cov = fs.get_mean_cov()
    np.testing.assert_allclose(mean, x.mean(0), atol=1e-5)
    np.testing.assert_allclose(cov, np.cov(x.T, bias=True), atol=1e-4)

    # merge equals single-pass
    a, b = FeatureStats(capture_mean_cov=True), FeatureStats(capture_mean_cov=True)
    a.append(x[:250]); b.append(x[250:])
    m2, c2 = a.merge(b).get_mean_cov()
    np.testing.assert_allclose(m2, mean, atol=1e-6)
    np.testing.assert_allclose(c2, cov, atol=1e-6)


def test_feature_stats_max_items(rng):
    from afldm_tpu.utils.metric_utils import FeatureStats
    fs = FeatureStats(capture_all=True, max_items=10)
    fs.append(rng.standard_normal((7, 4)))
    fs.append(rng.standard_normal((7, 4)))
    assert fs.is_full() and fs.get_all().shape == (10, 4)


def test_check_replica_consistency():
    """Replicated arrays pass; per-device divergence raises (the JAX
    analog of check_ddp_consistency, ref torch_utils/misc.py:197)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import pytest
    from jax.sharding import NamedSharding, PartitionSpec as P
    from afldm_tpu.parallel.mesh import create_mesh
    from afldm_tpu.utils import check_replica_consistency

    mesh = create_mesh(data=len(jax.devices()))
    rep = NamedSharding(mesh, P())
    tree = {"w": jax.device_put(jnp.arange(8, dtype=jnp.float32), rep)}
    assert check_replica_consistency(tree, mesh) == 0.0

    # a genuinely SHARDED leaf (data axis) has different shards by design
    # and must be skipped, even though every shard has the same shape
    n = len(jax.devices())
    sharded = jax.device_put(jnp.arange(8 * n, dtype=jnp.float32),
                             NamedSharding(mesh, P("data")))
    assert check_replica_consistency({"w": sharded}, mesh) == 0.0

    # hand-build a "replicated" array whose shards differ (needs >= 2
    # devices for a second, divergent shard to exist at all)
    if n > 1:
        shards = [jax.device_put(jnp.full((8,), float(i)), d)
                  for i, d in enumerate(mesh.devices.flat)]
        bad = jax.make_array_from_single_device_arrays(
            (8,), rep, shards)
        with pytest.raises(AssertionError):
            check_replica_consistency({"w": bad}, mesh)

    # NaN drift on one replica is divergence, not a silent pass
    shards = [jax.device_put(
        jnp.zeros((8,)).at[0].set(jnp.nan if i == 1 else 0.0), d)
        for i, d in enumerate(mesh.devices.flat)]
    nan_bad = jax.make_array_from_single_device_arrays((8,), rep, shards)
    if n > 1:
        with pytest.raises(AssertionError):
            check_replica_consistency({"w": nan_bad}, mesh)


def test_frechet_distance():
    """frechet_distance over FeatureStats: zero for identical stats,
    matches the closed form for two Gaussians."""
    from afldm_tpu.utils.metric_utils import FeatureStats, frechet_distance

    r = np.random.default_rng(0)
    a = r.standard_normal((512, 6)).astype(np.float32)
    b = (a * 1.5 + 2.0).astype(np.float32)

    sa, sb = FeatureStats(capture_mean_cov=True), \
        FeatureStats(capture_mean_cov=True)
    sa2 = FeatureStats(capture_mean_cov=True)
    sa.append(a)
    sa2.append(a)
    sb.append(b)
    assert abs(frechet_distance(sa, sa2)) < 1e-6

    # closed form: |mu_a-mu_b|^2 + tr(Ca + Cb - 2 (Ca^1/2 Cb Ca^1/2)^1/2)
    import scipy.linalg
    mu_a, ca = sa.get_mean_cov()
    mu_b, cb = sb.get_mean_cov()
    ra = scipy.linalg.sqrtm(ca)
    expect = (np.square(mu_a - mu_b).sum()
              + np.trace(ca + cb - 2 * np.real(
                  scipy.linalg.sqrtm(ra @ cb @ ra))))
    got = frechet_distance(sa, sb)
    assert abs(got - expect) / max(abs(expect), 1e-9) < 1e-4, (got, expect)


def test_frechet_distance_singular_cov():
    """Rank-deficient covariances (fewer samples than feature dim) must
    not warn or go non-finite — the eps*I fallback handles them."""
    import warnings

    from afldm_tpu.utils.metric_utils import FeatureStats, frechet_distance

    r = np.random.default_rng(1)
    a = r.standard_normal((3, 16)).astype(np.float32)   # rank <= 3 << 16
    b = r.standard_normal((3, 16)).astype(np.float32) + 1.0
    sa, sb = FeatureStats(capture_mean_cov=True), \
        FeatureStats(capture_mean_cov=True)
    sa.append(a)
    sb.append(b)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        d = frechet_distance(sa, sb)
    assert np.isfinite(d) and d > 0, d
