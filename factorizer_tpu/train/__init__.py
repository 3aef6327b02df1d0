from .losses import dice_loss, bce_with_logits, dice_ce_loss, deep_supervision_loss
from .metrics import dice_metric, MeanDice, hausdorff_distance_95, MeanHausdorffDistance
from .schedules import warmup_cosine_schedule, make_adamw
from .trainer import TrainState, create_train_state, make_train_step, make_eval_step
from .sliding_window import (
    sliding_window_inference,
    sliding_window_positions,
    compute_importance_map,
    SlidingWindowInfererAdapt,
)
from .loop import SegmentationTrainer, Evaluator, EnsembleEvaluator
from .checkpoint import CheckpointManager, save_checkpoint, restore_checkpoint, load_checkpoints
