"""Training/eval modules (SURVEY.md C20-C21): jitted steps, checkpointing, metrics."""

from disconet_tpu.training.det_module import (  # noqa: F401
    DetTrainState,
    create_train_state,
    make_train_step,
    make_train_step_multi,
    stack_host_batches,
    make_eval_step,
    make_predict_step,
    batch_to_device,
    get_bev,
    prefetch_to_device,
)
from disconet_tpu.training.checkpoint import (  # noqa: F401
    CheckpointIO,
    restore_or_die,
    save_pth,
    load_pth,
)
from disconet_tpu.training.metrics import AverageMeter, MetricLogger  # noqa: F401
