from posediffusion_tpu.training.checkpoints import (
    latest_checkpoint,
    load_reference_checkpoint,
    restore,
    save,
)
from posediffusion_tpu.training.optim import (
    freeze_labels_for,
    make_optimizer,
    warmup_cosine_restarts,
)
from posediffusion_tpu.training.stats import StatsLogger
from posediffusion_tpu.training.step import (
    TrainState,
    jit_train_step,
    make_eval_step,
    make_sharded_train_step,
    make_train_step,
    pose_metrics,
)
