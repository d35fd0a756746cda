from styler_tpu.train.losses import (  # noqa: F401
    dat_loss,
    masked_mae,
    masked_mse,
    nll_loss,
    styler_loss,
)
from styler_tpu.train.optimizer import make_optimizer, noam_schedule  # noqa: F401
from styler_tpu.train.state import TrainState, create_train_state  # noqa: F401
from styler_tpu.train.step import (  # noqa: F401
    eval_step,
    make_jitted_eval_step,
    make_jitted_train_step,
    train_step,
)
