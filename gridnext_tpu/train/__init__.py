from gridnext_tpu.train.loops import (  # noqa: F401
    TrainState,
    create_train_state,
    load_checkpoint,
    load_f_params,
    make_gridwise_optimizer,
    masked_cross_entropy,
    save_checkpoint,
    train_gridwise,
    train_spotwise,
)
