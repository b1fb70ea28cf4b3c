from evoke_tpu.train.optim import (build_optimizer, build_scheduler, set_lr_scale,
                                   PlateauScheduler, StepScheduler, WarmupCosineScheduler)
from evoke_tpu.train.steps import (TrainState, create_train_state, make_eval_step,
                                   make_generate_step, make_train_step)
from evoke_tpu.train.trainer import BaseTrainer, FinetuneTrainer, PretrainTrainer, Tester
