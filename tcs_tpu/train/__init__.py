from tcs_tpu.train.optim import make_optimizer, onecycle_linear_schedule  # noqa: F401
from tcs_tpu.train.train_step import (  # noqa: F401
    FrameBatch,
    SequenceBatch,
    make_eval_step,
    make_train_step,
)
