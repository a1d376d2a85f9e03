"""Shared frame-axis (sequence) sharding + VAE jit-cache helpers for the
video-class pipelines (interpolation, video editing).

Each frame attends only to replicated endpoint/STORE KV trajectories
(SURVEY.md §5.7), so placing the leading frame dim over the mesh 'data'
axis lets GSPMD compile a collective-free frame-parallel denoise+decode.
GSPMD requires the sharded axis to be a multiple of the axis size, so
callers pad the frame axis (``_pad_rows``, repeat-last) before sharding
and slice back (``_slice_rows``) after — both jitted and cached, since
this backend has no eager dispatch (CLAUDE.md).
"""
from functools import partial

import jax
import jax.numpy as jnp


class FrameShardingMixin:
    """Requires ``self.mesh`` (jax.sharding.Mesh or None), ``self._fns``
    (dict), ``self.vae`` / ``self.vae_params``."""

    def _data_shards(self) -> int:
        if self.mesh is None:
            return 1
        return self.mesh.shape.get("data", 1)

    def _frame_pad(self, n: int) -> int:
        """Rows to add so n is a multiple of the mesh 'data' axis."""
        return (-n) % self._data_shards()

    def _pad_rows(self, a, pad: int):
        if pad == 0:
            return a
        key = ("pad_rows", pad)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(
                lambda p, x: jnp.concatenate(
                    [x, jnp.repeat(x[-1:], p, axis=0)], axis=0), pad))
        return self._fns[key](a)

    def _slice_rows(self, a, n: int):
        if a.shape[0] == n:
            return a
        key = ("slice_rows", n)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(lambda m, x: x[:m], n))
        return self._fns[key](a)

    def _shard_frames(self, *arrs):
        """device_put each array with its leading (frame) axis over the
        mesh 'data' axis. Every array's axis 0 must already be a multiple
        of the axis size — pad with ``_pad_rows`` first."""
        if self._data_shards() <= 1:
            return arrs if len(arrs) > 1 else arrs[0]
        shards = self._data_shards()
        for a in arrs:
            if a.shape[0] % shards:
                raise ValueError(
                    f"frame axis {a.shape[0]} not divisible by the mesh "
                    f"'data' axis ({shards}); pad with _pad_rows first")
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P("data"))
        out = tuple(jax.device_put(a, sh) for a in arrs)
        return out if len(out) > 1 else out[0]

    def _decode_chunked(self, latents, chunk=None):
        """Frame-chunked ``self.decode`` for single-chip runs: the
        alias-free VAE's 2x-oversampled intermediates for N frames can
        exhaust HBM at >=512 px (normal_control.py decodes in chunks of 4
        for the same reason). With a mesh the decode is frame-parallel
        already, so chunking would only serialize it."""
        if not chunk or self.mesh is not None or latents.shape[0] <= chunk:
            return self.decode(latents)
        return jnp.concatenate(
            [self.decode(latents[i:i + chunk])
             for i in range(0, latents.shape[0], chunk)], axis=0)

    def _vae_fn(self, method):
        # jit ONCE per pipeline: a fresh jax.jit(partial(...)) per call
        # re-traces the whole AF-VAE every time (~90 s host-side at 512px)
        key = ("vae", method)
        if key not in self._fns:
            self._fns[key] = jax.jit(partial(self.vae.apply, method=method))
        return self._fns[key]
