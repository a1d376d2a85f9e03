"""Tensor-parallel / FSDP sharding rules for the ('data', 'model') mesh.

The reference is DDP-only (SURVEY.md §2.11); the mesh here has carried a
'model' axis since round 1 as the TP seam. These rules make it real: under
GSPMD, annotating the PARAMETERS is all tensor parallelism needs — XLA
partitions every matmul/conv touching a sharded operand and inserts the
all-gathers/reduce-scatters (over ICI, given create_mesh's hybrid layout).

Two independent knobs, freely combinable:

- **TP** (``model_size > 1``): shard the OUTPUT-channel dim of conv/dense
  kernels over 'model' — column-parallel; activations stay batch-sharded,
  a gather follows each GroupNorm.
- **FSDP** (``fsdp=True``): additionally shard a large remaining dim of
  every eligible kernel over 'data' (ZeRO-3 by annotation: XLA all-gathers
  the weight shards at each use inside the step and reduce-scatters the
  grads; Adam mu/nu and EMA follow the same specs, so optimizer state is
  sharded too). Input channels are preferred so TP+FSDP compose on
  disjoint dims.

Rule selection is shape-based, so one function applies uniformly to
params, Adam mu/nu, and EMA.

Output-channel sharding composes through the UNet: the following GroupNorm
forces a gather per block, which XLA schedules over ICI; at the ≤1k-channel
scales of this model family TP/FSDP are memory tools (params + Adam state
/ shards), not throughput ones — measured note in BENCH_NOTES.md.
"""

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def leaf_spec(leaf, model_size: int, min_per_shard: int = 4,
              fsdp_size: int = 1):
    shape = getattr(leaf, "shape", ())

    def ok(dim, size):
        return dim % size == 0 and dim // size >= min_per_shard

    if len(shape) == 4:  # HWIO conv kernel
        spec = [None, None, None, None]
        if model_size > 1 and ok(shape[3], model_size):
            spec[3] = "model"
        if fsdp_size > 1:
            if ok(shape[2], fsdp_size):          # input channels
                spec[2] = "data"
            elif spec[3] is None and ok(shape[3], fsdp_size):
                spec[3] = "data"                 # e.g. conv_in (3 -> C)
        return P(*spec)
    if len(shape) == 2:  # dense kernel (in, out)
        spec = [None, None]
        if model_size > 1 and ok(shape[1], model_size):
            spec[1] = "model"
        if fsdp_size > 1:
            if ok(shape[0], fsdp_size):
                spec[0] = "data"
            elif spec[1] is None and ok(shape[1], fsdp_size):
                spec[1] = "data"
        return P(*spec)
    if len(shape) == 1 and fsdp_size > 1 and ok(shape[0], fsdp_size * 32):
        # only worth sharding big 1-D leaves (time embeddings etc.);
        # biases/norm scales stay replicated
        return P("data")
    return P()


def tree_shardings(tree, mesh: Mesh, min_per_shard: int = 4,
                   fsdp: bool = False):
    """NamedSharding pytree for an arbitrary state tree (params, opt state,
    EMA — anything whose leaves follow the parameter shapes)."""
    m = mesh.shape.get("model", 1)
    f = mesh.shape.get("data", 1) if fsdp else 1
    if m <= 1 and f <= 1:
        rep = NamedSharding(mesh, P())
        return jax.tree_util.tree_map(lambda _: rep, tree)
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, leaf_spec(leaf, m, min_per_shard, fsdp_size=f)),
        tree)


def place(tree, mesh: Mesh, min_per_shard: int = 4, fsdp: bool = False):
    """device_put a state tree according to the TP/FSDP rules."""
    return jax.device_put(tree, tree_shardings(tree, mesh, min_per_shard,
                                               fsdp=fsdp))
