from gridnext_tpu.train.async_ckpt import AsyncCheckpointWriter  # noqa: F401
from gridnext_tpu.train.preempt import (  # noqa: F401
    TrainingPreempted,
    install_preemption_handler,
)
from gridnext_tpu.train.loops import (  # noqa: F401
    TrainState,
    create_train_state,
    load_checkpoint,
    load_f_params,
    make_gridwise_optimizer,
    make_mlm_steps,
    make_steps,
    masked_cross_entropy,
    restore_train_state,
    save_checkpoint,
    train_gridwise,
    mlm_token_len,
    train_mlm,
    train_spotwise,
)
from gridnext_tpu.train.distill import (  # noqa: F401
    distill_patch_classifier,
    write_count_distilled_mm_dir,
    label_agreement,
    patch_agreement,
    write_distilled_model_dir,
)
