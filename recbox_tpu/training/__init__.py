from recbox_tpu.training.trainer import Trainer, TrainerConfig
from recbox_tpu.training.monitor import Monitor
from recbox_tpu.training.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["Trainer", "TrainerConfig", "Monitor", "save_checkpoint", "load_checkpoint"]
