from .optim import (torch_adam, torch_adamw, ReduceLROnPlateau, StepLR,
                    set_learning_rate_scale)
from .state import TrainState, create_train_state
from .checkpoint import save_checkpoint, load_checkpoint
from .classification import (run_one_epoch, train, stratified_batch_indices,
                             cross_val_score, create_model_opt)
from .seg import (seg_train_step, seg_eval_step, packed_seg_train_step,
                  packed_seg_eval_step, run_epoch, train_segmentation,
                  get_model_and_optimizer, Action)
from .resilience import CheckpointManager, train_segmentation_resilient
from .fader import adv_loss, fader_main_loss, train_fader, FaderState

__all__ = [
    "torch_adam", "torch_adamw", "ReduceLROnPlateau", "StepLR",
    "set_learning_rate_scale", "TrainState", "create_train_state",
    "save_checkpoint", "load_checkpoint",
    "run_one_epoch", "train", "stratified_batch_indices", "cross_val_score",
    "create_model_opt",
    "seg_train_step", "seg_eval_step", "packed_seg_train_step",
    "packed_seg_eval_step", "run_epoch", "train_segmentation",
    "get_model_and_optimizer", "Action",
    "CheckpointManager", "train_segmentation_resilient",
    "adv_loss", "fader_main_loss", "train_fader", "FaderState",
]
