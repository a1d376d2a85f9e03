"""Trainer protocol + factory (same hook surface as the reference's abstract
Trainer, afldm/trainers/trainer.py:4-78) and shared optimizer/train-state
machinery.

JAX inversion: a trainer owns static objects (model defs, schedulers, mesh)
and a ``TrainState`` pytree (params, opt_state, EMA, step); ``training_step``
is a single jitted, data-parallel function. DDP/accelerate (train.py:54-60)
becomes mesh sharding: batch on the 'data' axis, state replicated, XLA
inserts the gradient all-reduce."""

import abc
import json
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..parallel.mesh import create_mesh, data_sharding, replicated_sharding
from .ema import ema_init


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    ema_params: Any          # None when EMA disabled
    ema_step: jnp.ndarray
    step: jnp.ndarray


def make_optimizer(cfg, total_steps: Optional[int] = None,
                   grad_accum: int = 1, train_batch_size: int = 1):
    """AdamW + lr schedule + global-norm clip (the reference's AdamW/
    get_scheduler stack, ldm_trainer.py:168-184). ``scale_lr`` multiplies
    the lr by grad_accum * batch * processes (ldm_trainer.py:163-167)."""
    base_lr = cfg.learning_rate
    if getattr(cfg, "scale_lr", False):
        base_lr = (base_lr * grad_accum * train_batch_size
                   * jax.process_count())
    if cfg.lr_scheduler == "constant":
        lr = optax.schedules.join_schedules(
            [optax.schedules.linear_schedule(0.0, base_lr,
                                             max(cfg.lr_warmup_steps, 1)),
             optax.schedules.constant_schedule(base_lr)],
            [max(cfg.lr_warmup_steps, 1)]) if cfg.lr_warmup_steps else \
            optax.schedules.constant_schedule(base_lr)
    elif cfg.lr_scheduler == "cosine":
        assert total_steps is not None
        lr = optax.schedules.warmup_cosine_decay_schedule(
            0.0, base_lr, cfg.lr_warmup_steps, total_steps)
    else:
        raise ValueError(cfg.lr_scheduler)
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(lr, b1=cfg.adam_beta1, b2=cfg.adam_beta2,
                    eps=cfg.adam_epsilon,
                    weight_decay=cfg.adam_weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def remat_policy(name: str):
    """Map BaseTrainingConfig.remat_policy to a jax.checkpoint policy.
    "full" -> None (recompute everything, minimum HBM); "dots" -> keep
    matmul/conv outputs, recompute elementwise (higher MFU)."""
    if name == "full":
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat_policy {name!r} (full|dots)")


def load_json(path):
    with open(path) as f:
        return json.load(f)


class Trainer(abc.ABC):
    """Hook surface mirroring trainers/trainer.py:4-60."""

    def __init__(self, base_cfg, cfg, mesh=None):
        self.base_cfg = base_cfg
        self.cfg = cfg
        model = getattr(base_cfg, "model_parallel", 1) or 1
        if mesh is None:
            # the data axis must divide the global batch
            import math
            n = len(jax.devices())
            assert n % model == 0, (n, model)
            data = math.gcd(base_cfg.train_batch_size, n // model)
            mesh = create_mesh(data=data, model=model)
        self.mesh = mesh
        self.model_parallel = self.mesh.shape.get("model", 1)
        self.data_sharding = data_sharding(self.mesh)
        self.replicated = replicated_sharding(self.mesh)
        self.weight_dtype = (jnp.bfloat16
                             if base_cfg.mixed_precision == "bf16"
                             else jnp.float32)

    # lifecycle hooks (reference names)
    @abc.abstractmethod
    def init_modules(self):
        ...

    @abc.abstractmethod
    def init_optimizers(self):
        ...

    def init_lr_schedulers(self):  # folded into make_optimizer
        pass

    def set_dataset(self, dataset, dataloader=None):
        self.dataset = dataset

    @abc.abstractmethod
    def prepare_modules(self):
        """Build + shard the TrainState and jit the step."""

    def models_to_train(self):
        pass

    @abc.abstractmethod
    def training_step(self, global_step, batch) -> dict:
        ...

    def validate(self, global_step):
        return {}

    def save_pipeline(self, output_dir):
        pass

    # checkpoint hooks
    def state_for_checkpoint(self):
        return self.state

    def load_state(self, state):
        self.state = state

    # helpers
    def replicate(self, tree):
        return jax.device_put(tree, self.replicated)

    def state_shardings(self, tree):
        """TP/FSDP-aware placement tree: parameter-shaped leaves shard
        their output channels over the 'model' axis, and (with
        ``base_cfg.fsdp``) a second large dim over 'data'
        (parallel/sharding_rules); with model_parallel == 1 and fsdp off
        this is plain replication."""
        from ..parallel.sharding_rules import tree_shardings
        return tree_shardings(tree, self.mesh,
                              fsdp=getattr(self.base_cfg, "fsdp", False))

    def place_state(self, tree):
        return jax.device_put(tree, self.state_shardings(tree))

    def shard(self, batch):
        """Batch placement; multi-host aware (each process passes its
        per-host slice from epoch_batches(process_index=...) and the global
        array is reassembled — collectives.shard_batch)."""
        from ..parallel.collectives import shard_batch
        return shard_batch(batch, self.mesh)

    def init_train_state(self, params, tx, use_ema):
        ema = ema_init(params).params if use_ema else None
        return TrainState(params=params, opt_state=tx.init(params),
                          ema_params=ema,
                          ema_step=jnp.zeros((), jnp.int32),
                          step=jnp.zeros((), jnp.int32))


def create_trainer(name: str, base_cfg, cfg, mesh=None) -> Trainer:
    """Factory (ref trainer.py:63-78)."""
    from .vae_trainer import VAETrainer
    from .ldm_trainer import LDMTrainer
    from .i2sb_trainer import I2SBTrainer
    from .sd_text_trainer import SDTextTrainer
    from .norm_controlnet_trainer import NormControlNetTrainer
    registry = {
        "vae": VAETrainer,
        "ldm": LDMTrainer,
        "i2sb": I2SBTrainer,
        "sd_text": SDTextTrainer,
        "norm_controlnet": NormControlNetTrainer,
    }
    return registry[name](base_cfg, cfg, mesh=mesh)
