from .config import (load_training_config, BaseTrainingConfig,
                     VAETrainingConfig, LDMTrainingConfig,
                     I2SBLDMTrainingConfig)
from .trainer import Trainer, TrainState, create_trainer, make_optimizer
from .ema import ema_init, ema_update, EMAState
from .checkpoint import (save_checkpoint, restore_checkpoint,
                         restore_checkpoint_lenient,
                         latest_checkpoint, wait_for_checkpoints)
from .data import (SyntheticDataset, ImageFolderDataset, DeadLeavesDataset,
                   render_dead_leaves_folder, make_dataset,
                   epoch_batches)

__all__ = [
    "load_training_config", "BaseTrainingConfig", "VAETrainingConfig",
    "LDMTrainingConfig", "I2SBLDMTrainingConfig",
    "Trainer", "TrainState", "create_trainer", "make_optimizer",
    "ema_init", "ema_update", "EMAState",
    "save_checkpoint", "restore_checkpoint", "restore_checkpoint_lenient",
    "latest_checkpoint",
    "wait_for_checkpoints",
    "SyntheticDataset", "ImageFolderDataset", "DeadLeavesDataset",
    "render_dead_leaves_folder", "make_dataset",
    "epoch_batches",
]
