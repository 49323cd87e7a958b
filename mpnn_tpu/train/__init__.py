from mpnn_tpu.train.optim import (
    adam,
    ReduceLROnPlateau,
    set_learning_rate,
    get_learning_rate,
)
from mpnn_tpu.train import metrics
from mpnn_tpu.train.checkpoint import (
    save_checkpoint,
    load_checkpoint,
    latest_checkpoint,
)
from mpnn_tpu.train.logging import MetricLogger
from mpnn_tpu.train.trainer import (
    TrainConfig,
    train,
    evaluate,
    make_train_step,
    make_eval_step,
    make_loss_fn,
)
from mpnn_tpu.train.experiments import EXPERIMENTS, Experiment, get
