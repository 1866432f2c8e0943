from .optimizer import make_optimizer, make_lr_schedule
