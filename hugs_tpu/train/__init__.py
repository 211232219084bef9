from hugs_tpu.train.optim import (
    GroupAdamState, group_adam_init, group_adam_update, expon_lr,
)
