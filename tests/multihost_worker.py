"""Worker for the 2-process multi-host eval test (run via subprocess).

Usage: python multihost_worker.py <coordinator> <num_procs> <proc_id>
Prints "ACC <top1> <top5>" computed over the GLOBAL dataset.
"""
import sys

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

import jax  # noqa: E402

jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
)

import numpy as np  # noqa: E402

from eqxvision_tpu.core import tree_inference  # noqa: E402
from eqxvision_tpu.models.classification.vit import VisionTransformer  # noqa: E402
from eqxvision_tpu.parallel import make_mesh, replicate  # noqa: E402
from eqxvision_tpu.parallel.multihost import evaluate_multihost  # noqa: E402

assert jax.process_count() == num_procs
mesh = make_mesh(devices=jax.devices())  # all processes' devices

# identical deterministic model on every process
model = VisionTransformer(img_size=32, patch_size=16, embed_dim=64, depth=1, num_heads=4, num_classes=5, key=jax.random.PRNGKey(0))
model = tree_inference(model, True)
model = replicate(model, mesh)

# deterministic global dataset: 32 samples, batch 8 -> local batch 4
rng = np.random.RandomState(0)
xs = rng.rand(32, 32, 32, 3).astype(np.float32)
ys = rng.randint(0, 5, size=(32,)).astype(np.int32)
global_batches = [(xs[i : i + 8], ys[i : i + 8]) for i in range(0, 32, 8)]
# each process feeds its row-slice of every global batch
local_batches = [
    (x[proc_id * 4 : (proc_id + 1) * 4], y[proc_id * 4 : (proc_id + 1) * 4])
    for x, y in global_batches
]

top1, top5 = evaluate_multihost(model, {}, local_batches, mesh)
print(f"ACC {top1:.6f} {top5:.6f}", flush=True)
