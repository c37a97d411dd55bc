from .mesh import (
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
    shard_params_tp,
    tp_spec_for_path,
)
from .multihost import (
    evaluate_multihost,
    host_local_to_global,
    local_shard,
    make_global_eval_step,
)
from .ema import ema_init, ema_params, ema_update
from .multihost import initialize as initialize_multihost
from .train import evaluate, make_eval_step, make_scan_epoch, make_train_step, softmax_cross_entropy
