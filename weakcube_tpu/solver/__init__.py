from .build import build_optimizer, build_lr_schedule, freeze_bn  # noqa: F401
