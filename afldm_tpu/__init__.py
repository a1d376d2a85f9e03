"""afldm_tpu — TPU-native Alias-Free Latent Diffusion framework.

A from-scratch JAX/Flax/Pallas rebuild of the capability surface of
SingleZombie/AFLDM (CVPR 2025, arXiv 2503.09419). Everything is designed
TPU-first:

- NHWC tensor layout throughout (TPU-native conv layout).
- All alias-free primitives are pure functions of static-shaped arrays; FFT
  rect masks are compile-time constants under ``jax.jit`` (the reference
  caches them in Python dicts at runtime, ``af_libs/ideal_lpf.py:80-88``).
- Denoising loops are ``lax.scan``-traced, not Python loops.
- Cross-frame attention is an explicit KV-cache pytree, not mutable
  processor state (reference: ``pipelines/cross_frame_attn.py``).
- Distribution is a ``jax.sharding.Mesh`` + XLA collectives, not DDP/NCCL.
"""

__version__ = "0.1.0"
