from sepreformer_tpu.engine.train import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_forward_fn,
    make_train_step,
)
from sepreformer_tpu.engine.engine import Engine  # noqa: F401
