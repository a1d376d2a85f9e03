"""Support utilities (parity surface for the reference's
torch_utils/misc.py): shape assertions, constant caching, module summaries,
and an infinite sampler."""

import numpy as np
import jax
import jax.numpy as jnp

_constant_cache = {}


def constant(value, shape=None, dtype=jnp.float32):
    """Cached device constant (ref misc.py:23-49)."""
    key = (repr(value), shape, str(dtype))
    if key not in _constant_cache:
        arr = np.asarray(value, dtype=np.dtype(str(dtype)))
        if shape is not None:
            arr = np.broadcast_to(arr, shape)
        _constant_cache[key] = jnp.asarray(arr)
    return _constant_cache[key]


def nan_to_num(x, nan=0.0, posinf=None, neginf=None):
    """ref misc.py:52-61."""
    return jnp.nan_to_num(x, nan=nan, posinf=posinf, neginf=neginf)


def assert_shape(tensor, ref_shape):
    """Shape assertion allowing None wildcards (ref misc.py:87-108)."""
    if tensor.ndim != len(ref_shape):
        raise AssertionError(
            f"Wrong number of dimensions: got {tensor.ndim}, "
            f"expected {len(ref_shape)}")
    for idx, (size, ref_size) in enumerate(zip(tensor.shape, ref_shape)):
        if ref_size is None:
            continue
        if size != ref_size:
            raise AssertionError(
                f"Wrong size for dimension {idx}: got {size}, "
                f"expected {ref_size}")


class InfiniteSampler:
    """Deterministic shuffled infinite index stream (ref misc.py:122-157),
    host-side; shards across data-parallel workers via rank/num_replicas."""

    def __init__(self, dataset_size, rank=0, num_replicas=1, shuffle=True,
                 seed=0, window_size=0.5):
        assert dataset_size > 0
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self):
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def params_count(params):
    return sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params))


def print_module_summary(params, max_depth=2):
    """Parameter-count summary by subtree (ref misc.py:214-295)."""
    def walk(tree, path, depth):
        if not isinstance(tree, dict) or depth == max_depth:
            n = params_count(tree)
            print(f"{'/'.join(path) or '<root>':60s} {n:>12,d}")
            return n
        total = 0
        for k in tree:
            total += walk(tree[k], path + [k], depth + 1)
        return total
    total = walk(params, [], 0)
    print(f"{'TOTAL':60s} {total:>12,d}")
    return total


def check_replica_consistency(tree, mesh, name="params"):
    """JAX analog of the reference's ``check_ddp_consistency``
    (torch_utils/misc.py:197): assert that nominally-replicated arrays
    are bit-identical across the data axis of ``mesh``. Under DDP,
    replicas can silently drift after a collective bug or a non-
    deterministic op; under jit + replicated shardings XLA keeps one
    logical value, so this guards the hand-rolled paths (per-host data
    loading, manual device_put) where drift can still be introduced.

    Only fully-replicated leaves are checked (a sharded leaf's shards
    legitimately differ — ``leaf.sharding.is_fully_replicated`` is the
    discriminator, not shard shapes, which even sharding can also
    equalize). NaN divergence counts as divergence (reported as inf).

    Returns the max |replica - replica0| over the tree (0.0 when
    consistent); raises AssertionError on divergence.
    """
    del mesh  # the leaves' own shardings carry the replication info
    worst = 0.0
    worst_path = None
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        sharding = getattr(leaf, "sharding", None)
        if sharding is None or not sharding.is_fully_replicated:
            continue
        shards = leaf.addressable_shards
        if len(shards) < 2:
            continue
        base = np.asarray(shards[0].data)
        for s in shards[1:]:
            a = np.asarray(s.data)
            if (np.array_equal(a, base, equal_nan=True)
                    if np.issubdtype(base.dtype, np.floating)
                    else np.array_equal(a, base)):
                continue   # identical (incl. matching NaN patterns)
            d = float(np.max(np.abs(a - base)))
            if np.isnan(d):
                d = float("inf")
            if d >= worst:
                worst, worst_path = max(d, worst), jax.tree_util.keystr(path)
    assert worst == 0.0, (
        f"{name} replicas diverged: max |delta| = {worst} at {worst_path}")
    return worst
