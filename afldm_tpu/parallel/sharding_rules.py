"""Tensor-parallel sharding rules for the 'model' mesh axis.

The reference is DDP-only (SURVEY.md §2.11); the mesh here has carried a
'model' axis since round 1 as the TP seam. These rules make it real: under
GSPMD, annotating the PARAMETERS is all tensor parallelism needs — XLA
partitions every matmul/conv touching a sharded operand and inserts the
all-gathers/reduce-scatters (over ICI, given create_mesh's hybrid layout).

Rule (shape-based, so it applies uniformly to params, Adam mu/nu, EMA):

- conv kernels (HWIO, ndim 4): shard the OUTPUT-channel dim over 'model'
  when divisible and wide enough — column-parallel convolution,
- dense kernels (in, out): shard the output dim likewise,
- everything else (biases, norm scales, scalars, embeddings): replicated.

Output-channel sharding composes through the UNet: the following GroupNorm
forces a gather per block, which XLA schedules over ICI; at the ≤1k-channel
scales of this model family TP is a memory tool (params + Adam state /
model_size), not a throughput one — measured note in BENCH_NOTES.md.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_spec(leaf, model_size: int, min_per_shard: int = 4):
    shape = getattr(leaf, "shape", ())
    if len(shape) == 4:  # HWIO conv kernel
        if shape[3] % model_size == 0 and shape[3] // model_size >= min_per_shard:
            return P(None, None, None, "model")
    elif len(shape) == 2:  # dense kernel (in, out)
        if shape[1] % model_size == 0 and shape[1] // model_size >= min_per_shard:
            return P(None, "model")
    return P()


def tree_shardings(tree, mesh: Mesh, min_per_shard: int = 4):
    """NamedSharding pytree for an arbitrary state tree (params, opt state,
    EMA — anything whose leaves follow the parameter shapes)."""
    m = mesh.shape.get("model", 1)
    if m <= 1:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, tree)
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, leaf_spec(leaf, m, min_per_shard)),
        tree)


def place(tree, mesh: Mesh, min_per_shard: int = 4):
    """device_put a state tree according to the TP rules."""
    return jax.device_put(tree, tree_shardings(tree, mesh, min_per_shard))
