"""Collective seams replacing the reference's NCCL usage (SURVEY.md §5.8):
DDP all-reduce -> psum/pmean over the 'data' mesh axis, accelerator.gather
-> all_gather, process-0 broadcast -> identity under replication.

Inside ``jax.jit`` with sharded inputs XLA inserts these automatically; the
explicit forms below are for shard_map bodies and for code that wants the
seam spelled out."""

import jax


def grad_sync(grads, axis_name: str = "data"):
    """Mean-reduce gradients across data-parallel workers (DDP allreduce
    equivalent). Use inside shard_map/pmap bodies."""
    return jax.tree_util.tree_map(
        lambda g: jax.lax.pmean(g, axis_name), grads)


def gather_metrics(value, axis_name: str = "data"):
    """Gather per-worker metric values to every worker
    (accelerator.gather equivalent, ref sd_text_trainer.py:276)."""
    return jax.lax.all_gather(value, axis_name)


def broadcast(value, axis_name: str = "data", src: int = 0):
    """Broadcast worker ``src``'s value to all workers."""
    full = jax.lax.all_gather(value, axis_name)
    return jax.tree_util.tree_map(lambda v: v[src], full)


def shard_batch(batch, mesh):
    """Place a host batch onto the mesh, sharded along the batch dim.

    Single-process: a plain device_put. Multi-host: each process passes its
    PER-HOST slice (see train.data.epoch_batches(process_index=...)) and the
    global array is assembled with make_array_from_process_local_data — the
    jax replacement for the DataLoader+DistributedSampler pair."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, x), batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
