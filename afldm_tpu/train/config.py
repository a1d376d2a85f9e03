"""Training config system — same three-tier JSON surface as the reference
(afldm/trainers/training_cfg.py:12-78): a file holds a ``base`` key plus
exactly one trainer key (vae | ldm | i2sb | sd_text | norm_controlnet).
Reference JSON configs load unchanged; unknown reference-only fields (e.g.
xformers flags) are accepted and ignored with a note."""

import json
from dataclasses import dataclass, field, fields
from typing import Optional


@dataclass
class BaseTrainingConfig:
    logging_dir: str = "logs"
    output_dir: str = "train_ckpt/run"

    logger: str = "tensorboard"
    checkpointing_steps: int = 500
    checkpoints_total_limit: int = 20
    valid_epochs: int = 100
    valid_steps: int = 0
    save_model_epochs: int = 100
    resume_from_checkpoint: Optional[str] = None

    seed: Optional[int] = None
    num_epochs: int = 200
    train_batch_size: int = 1
    dataloader_num_workers: int = 8
    gradient_accumulation_steps: int = 1
    mixed_precision: Optional[str] = None
    gradient_checkpointing: bool = False
    # remat selectivity when gradient_checkpointing is on: "full"
    # recomputes everything in the backward pass (minimum HBM); "dots"
    # uses jax.checkpoint_policies.dots_with_no_batch_dims_saveable —
    # matmul/conv outputs are kept, only elementwise work is recomputed
    # (trades HBM back for MFU; the standard TPU middle ground)
    remat_policy: str = "full"
    # MXU precision for the alias-free circulant matmuls
    # (ops.ideal_lpf.set_af_precision): "highest" (exact, default),
    # "high" (3-pass bf16, ~2e-4 — measured +0.014 dB on the flagship
    # shift eval, inside the 0.1 dB parity budget, ~1.6x faster at VAE
    # sizes), "default" (1-pass bf16, benchmarking only)
    af_precision: str = "highest"
    # tensor-parallel size of the mesh 'model' axis (1 = pure DP; params,
    # Adam state and EMA shard their output channels across it —
    # parallel/sharding_rules.py)
    model_parallel: int = 1
    # FSDP (ZeRO-3 by GSPMD annotation): shard params + Adam state + EMA
    # over the 'data' axis too; XLA all-gathers weight shards per use and
    # reduce-scatters grads (parallel/sharding_rules.py)
    fsdp: bool = False

    is_imagenet: bool = False
    prompt_dropout: float = 0.0
    dataset_name: Optional[str] = None
    dataset_config_name: Optional[str] = None
    train_data_dir: Optional[str] = None
    train_files: Optional[str] = None
    cache_dir: Optional[str] = None
    resolution: int = 512
    center_crop: bool = True
    random_flip: bool = False
    valid_data_dir: Optional[str] = None

    push_to_hub: bool = False
    hub_model_id: str = ""

    # accepted-for-compat, unused on TPU
    enable_xformers_memory_efficient_attention: bool = True


@dataclass
class _OptimConfig:
    scale_lr: bool = False
    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 500
    use_ema: bool = False
    foreach_ema: bool = False
    offload_ema: bool = False
    max_grad_norm: float = 1.0


@dataclass
class VAETrainingConfig(_OptimConfig):
    model_cfg: str = ""
    pretrained_model_name_or_path: Optional[str] = None
    use_disc: bool = False
    disc_cfg: Optional[str] = None
    use_shift_loss: bool = False
    disc_weight: float = 1.0
    perceptual_weight: float = 1.0
    # local torchvision-VGG16/lpips checkpoint for the real LPIPS filters
    # (ref vae_trainer.py:107 lpips(net='vgg')); empty -> random-feature
    # proxy (zero-egress default)
    lpips_vgg_path: str = ""
    kl_weight: float = 1e-6
    gradient_accumulation_steps: int = 2


@dataclass
class LDMTrainingConfig(_OptimConfig):
    vae_path: str = ""
    scheduler_path: str = ""
    is_vqvae: bool = False
    unet_config: Optional[str] = None
    unet_path: Optional[str] = None
    prediction_type: str = "epsilon"
    af_models: bool = False
    use_shift_loss: bool = False
    wrap_act: bool = True
    use_cross_attn: bool = True
    use_stop_grad: bool = False
    valid_seed: int = 0
    valid_batch_size: int = 1


@dataclass
class I2SBLDMTrainingConfig(_OptimConfig):
    scheduler_path: str = ""
    vae_path: Optional[str] = None
    unet_config: Optional[str] = None
    unet_path: Optional[str] = None
    af_models: bool = True
    is_ode: bool = True
    use_cfa: bool = False
    valid_seed: int = 0
    valid_batch_size: int = 1


@dataclass
class SDTextTrainingConfig(_OptimConfig):
    """Text-conditioned SD finetune (the reference's sd_text trainer is
    stale/broken, SURVEY.md §2.12; this is the corrected intent)."""
    pretrained_model_name_or_path: str = ""
    vae_path: Optional[str] = None
    af_models: bool = True
    use_shift_loss: bool = True
    use_cross_attn: bool = True
    valid_seed: int = 0
    valid_batch_size: int = 1


@dataclass
class NormControlNetConfig(_OptimConfig):
    """Latent-ControlNet normal-estimation training (corrected intent of the
    reference's stale norm_controlnet trainer)."""
    pretrained_model_name_or_path: str = ""
    controlnet_config: Optional[str] = None
    af_models: bool = True
    use_shift_loss: bool = True
    is_yoso: bool = True
    zero_input_prob: float = 0.4
    valid_seed: int = 0
    valid_batch_size: int = 1


TRAINER_CONFIG_CLASSES = {
    "base": BaseTrainingConfig,
    "vae": VAETrainingConfig,
    "ldm": LDMTrainingConfig,
    "i2sb": I2SBLDMTrainingConfig,
    "sd_text": SDTextTrainingConfig,
    "norm_controlnet": NormControlNetConfig,
}


def _build(cls, d):
    known = {f.name for f in fields(cls)}
    kept = {k: v for k, v in d.items() if k in known}
    return cls(**kept)


def load_training_config(config_path: str):
    """JSON file with 'base' + exactly one trainer key
    (ref training_cfg.py:65-78)."""
    with open(config_path) as f:
        data = json.load(f)
    base = data.pop("base")
    assert len(data) == 1, "config must have exactly one trainer key"
    key = next(iter(data))
    cls = TRAINER_CONFIG_CLASSES[key]
    return {"base": _build(BaseTrainingConfig, base),
            key: _build(cls, data[key])}
