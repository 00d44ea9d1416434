from equss_tpu.train.optim import build_optimizer, wd_mask  # noqa: F401
from equss_tpu.train.trainer import Trainer, TrainConfig  # noqa: F401
