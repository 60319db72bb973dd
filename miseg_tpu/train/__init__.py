from .schedules import scheduler_from_config, warmup_cosine, PlateauScheduler  # noqa: F401
from .optim import optimizer_from_config  # noqa: F401
from .engine import Trainer, TrainState  # noqa: F401
from .checkpoint import save_checkpoint, load_checkpoint, CheckpointManager  # noqa: F401
from .pretrained import load_swin_vit_torch, partial_load  # noqa: F401
