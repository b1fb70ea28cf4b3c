from evoke_tpu.train.optim import build_optimizer, set_lr_scale, PlateauScheduler, StepScheduler
