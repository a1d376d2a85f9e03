"""Checkpointing with the reference's two-tier layout (SURVEY.md §5.4):
``checkpoint-{step}/`` training-state directories with rotation keeping the
newest ``checkpoints_total_limit`` (train.py:353-382), via Orbax (async,
sharded-array aware), plus resume-from-latest scanning."""

import os
import re
import shutil

import orbax.checkpoint as ocp


def _ckpt_dirs(output_dir):
    if not os.path.isdir(output_dir):
        return []
    ds = [d for d in os.listdir(output_dir)
          if re.fullmatch(r"checkpoint-\d+", d)]
    return sorted(ds, key=lambda d: int(d.split("-")[1]))


def latest_checkpoint(output_dir):
    ds = _ckpt_dirs(output_dir)
    return os.path.join(output_dir, ds[-1]) if ds else None


# One process-wide async checkpointer: Orbax's StandardCheckpointer writes
# in a background thread (device arrays are snapshotted to host before
# save() returns), so training proceeds during the filesystem write.
# Orbax materializes the final `checkpoint-N` directory name only on
# finalize (tmp-dir + rename), so _ckpt_dirs / latest_checkpoint /
# rotation never observe a half-written checkpoint.
_CKPTR = None


def _ckptr():
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.StandardCheckpointer()
    return _CKPTR


def wait_for_checkpoints():
    """Block until every scheduled async save has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_checkpoint(output_dir, step, state, total_limit=None, block=True,
                    fresh=False):
    """state: any pytree of arrays (params, opt_state, ema, step...).

    ``block=False`` schedules an async write and returns immediately —
    the training loop's steady-state mode. Exit paths (SIGTERM save,
    end-of-training) and anything that immediately restores must use
    ``block=True`` or call ``wait_for_checkpoints()``. Note async mode can
    hold ``total_limit + 1`` committed dirs transiently (exactly 2 for
    total_limit=1) until the next blocking save prunes; the normal exit
    path always ends with a blocking save, which restores the cap.

    ``fresh=True`` uses a private checkpointer instead of the shared
    process-wide one — required from signal handlers, which may interrupt
    the main thread mid-``save()`` on the shared object."""
    path = os.path.abspath(os.path.join(output_dir, f"checkpoint-{step}"))
    c = ocp.StandardCheckpointer() if fresh else _ckptr()
    c.save(path, state, force=True)
    if block:
        c.wait_until_finished()
    if total_limit:
        # async mode: the just-scheduled save is not in _ckpt_dirs yet
        # (Orbax commits via tmp-dir + rename), so budget one slot for it —
        # steady state is exactly `total_limit` dirs after each commit
        limit = total_limit if block else max(total_limit - 1, 1)
        ds = _ckpt_dirs(output_dir)   # committed checkpoints only
        while len(ds) > limit:
            victim = ds.pop(0)
            shutil.rmtree(os.path.join(output_dir, victim),
                          ignore_errors=True)
    return path


def restore_checkpoint(path, target_state):
    """Restore into the structure/shardings of ``target_state``."""
    wait_for_checkpoints()   # the path may still be committing
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target_state)


def restore_checkpoint_lenient(path, target_state):
    """Restore the intersection of ``target_state`` and what is on disk.

    The trainers' ``save_pipeline`` layouts vary by configuration (EMA off
    writes ``{"unet_ema": {}}``; a VAE-only dir has no ``unet`` at all), so
    pipeline/weight loaders can't know the exact saved structure up front —
    and Orbax's strict restore raises on any mismatch. This reads the
    checkpoint's metadata first and adapts: target keys missing on disk are
    dropped from the result, and subtrees saved as ``{}`` restore as ``{}``.
    Training-state resume keeps using the strict ``restore_checkpoint`` —
    there a structure mismatch means corruption and must raise."""
    wait_for_checkpoints()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if not isinstance(target_state, dict):
        return ckptr.restore(path, target_state)
    meta = ckptr.metadata(path)
    # StepMetadata -> TreeMetadata -> raw tree dict (orbax >= 0.6); older
    # versions return the tree directly
    meta = getattr(meta, "item_metadata", meta)
    meta = getattr(meta, "tree", meta)
    if not isinstance(meta, dict):
        return ckptr.restore(path, target_state)

    def adapt(t, m):
        if isinstance(m, dict):
            if not m:
                return {}
            if isinstance(t, dict):
                return {k: adapt(t[k], m[k]) for k in t if k in m}
        return t

    target = adapt(target_state, meta)
    # partial_restore: the dir may hold keys the caller didn't ask for
    # (e.g. an LDM unet/unet_ema/vae dir read through a vae-only skeleton)
    ckptr2 = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
    return ckptr2.restore(
        path, args=ocp.args.PyTreeRestore(item=target, partial_restore=True))


def resume_step_from_path(path):
    m = re.search(r"checkpoint-(\d+)$", path.rstrip("/"))
    return int(m.group(1)) if m else 0
