from .base import BaseTrainer  # noqa: F401
from .builder import (  # noqa: F401
    build,
    build_dataloader,
    build_lr_scheduler,
    build_model,
    build_optimizer,
    build_postprocess,
    build_tester,
    build_trainer,
    build_transform,
)
from .checkpoint import CheckpointManager, load_checkpoint, save_checkpoint  # noqa: F401
from .tester import Tester  # noqa: F401
from .trainer import Trainer  # noqa: F401
