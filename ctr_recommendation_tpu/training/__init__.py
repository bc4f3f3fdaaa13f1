from ctr_recommendation_tpu.training.checkpoint import CheckpointManager
from ctr_recommendation_tpu.training.loop import Trainer, bce_with_logits
from ctr_recommendation_tpu.training.optim import make_optimizer, make_schedule
from ctr_recommendation_tpu.training.train_state import TrainState

__all__ = [
    "CheckpointManager",
    "Trainer",
    "TrainState",
    "bce_with_logits",
    "make_optimizer",
    "make_schedule",
]
