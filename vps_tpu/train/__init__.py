from vps_tpu.train.optim import build_optimizer, build_lr_schedule  # noqa: F401
from vps_tpu.train.step import TrainState, make_train_step, parse_losses  # noqa: F401
