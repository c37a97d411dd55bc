from .mesh import (
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
    shard_params_tp,
    tp_spec_for_path,
)
from .train import evaluate, make_eval_step, make_scan_epoch, make_train_step, softmax_cross_entropy
