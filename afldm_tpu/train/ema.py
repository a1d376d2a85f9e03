"""EMA of a parameter pytree with diffusers-EMAModel decay warmup
(the reference uses EMAModel with default power=2/3,
ldm_trainer.py:134-146)."""

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp


@dataclass
class EMAState:
    params: Any
    step: jnp.ndarray  # scalar int32


def ema_init(params) -> EMAState:
    # real copies — aliasing the live params would break buffer donation
    return EMAState(
        params=jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params),
        step=jnp.zeros((), jnp.int32))


def ema_update(state: EMAState, new_params, decay: float = 0.9999,
               use_warmup: bool = True, inv_gamma: float = 1.0,
               power: float = 2.0 / 3.0) -> EMAState:
    """diffusers EMAModel.get_decay: 1 - (1 + step/inv_gamma)^-power, capped
    at ``decay``; the canonical warmup used across its trainers."""
    step = state.step + 1
    if use_warmup:
        d = 1.0 - (1.0 + step.astype(jnp.float32) / inv_gamma) ** (-power)
        d = jnp.clip(d, 0.0, decay)
    else:
        d = jnp.asarray(decay, jnp.float32)
    new = jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
        state.params, new_params)
    return EMAState(params=new, step=step)


# pytree registration so EMAState rides through jit/scan
jax.tree_util.register_pytree_node(
    EMAState,
    lambda s: ((s.params, s.step), None),
    lambda _, c: EMAState(params=c[0], step=c[1]),
)
