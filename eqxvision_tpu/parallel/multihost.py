"""Multi-host (multi-process) evaluation seam.

SURVEY.md §2.5 names ``jax.distributed.initialize`` +
``jax.experimental.multihost_utils`` as this rebuild's equivalent of the
distributed comm backend the reference never had. The pieces:

- ``initialize()``: bring up the JAX distributed runtime (no-op when
  single-process). On TPU pods the arguments are auto-detected from the
  environment; on CPU/GPU pass coordinator/num_processes/process_id.
- ``local_shard(items)``: deterministic per-process shard of a sample
  list — each host decodes only its slice (data.py stays host-local).
- ``host_local_to_global(x, mesh, spec)``: assemble each host's local
  batch into one global sharded array (the device axes owned by this
  process receive this process's data).
- ``evaluate_multihost(...)``: eval loop whose top-1/top-5/count are
  computed on the global mesh — the jitted reduction over a
  data-sharded batch lowers to ICI/DCN psums, so every process sees
  identical global metrics with no host-side gather.

Single-host meshes degrade gracefully: process_count()==1 makes every
helper an identity/no-op, which is what the test suite exercises
alongside a 2-process CPU integration test
(tests/test_parallel.py::test_multihost_two_process_eval).
"""
from __future__ import annotations

from typing import Any, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs: Any,
) -> None:
    """Bring up the distributed runtime (idempotent, single-process no-op).

    On TPU pod slices all arguments are discovered from the metadata
    server, so ``initialize()`` suffices; elsewhere pass them explicitly.
    """
    if num_processes is not None and num_processes <= 1 and coordinator_address is None:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def local_shard(items: Sequence, index: Optional[int] = None, count: Optional[int] = None) -> list:
    """This process's contiguous shard of ``items`` (padding the tail
    shard by repeating the last item so every process yields the same
    number of batches — collective eval steps must stay in lockstep)."""
    count = jax.process_count() if count is None else count
    index = jax.process_index() if index is None else index
    if count == 1:
        return list(items)
    per = -(-len(items) // count)  # ceil
    shard = list(items[index * per : (index + 1) * per])
    while shard and len(shard) < per:
        shard.append(shard[-1])
    return shard


def host_local_to_global(x: Any, mesh: Mesh, spec: Optional[P] = None) -> Any:
    """Assemble per-process local arrays into one global sharded array.

    ``x``'s leading axis is this process's slice of the global batch;
    the global shape has ``leading * process_count`` rows sharded over
    the mesh's 'data' axis.
    """

    def put(a):
        s = spec if spec is not None else P("data", *([None] * (np.ndim(a) - 1)))
        return jax.make_array_from_process_local_data(NamedSharding(mesh, s), np.asarray(a))

    return jax.tree_util.tree_map(put, x)


def make_global_eval_step():
    """Jitted eval over a globally sharded batch. The sums reduce over
    the full (sharded) batch axis, so XLA inserts cross-device/-host
    psums; outputs are replicated global counts."""

    @jax.jit
    def eval_step(model, state, x, y):
        logits, _ = model(x, state)
        top1 = (jnp.argmax(logits, -1) == y).sum()
        top5_preds = jax.lax.top_k(logits, 5)[1]
        top5 = (top5_preds == y[:, None]).any(-1).sum()
        return top1, top5, y.shape[0]

    return eval_step


def evaluate_multihost(
    model,
    state,
    local_batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    mesh: Mesh,
    *,
    eval_step=None,
) -> Tuple[float, float]:
    """Top-1/top-5 over per-process local batches on a global mesh.

    Every process must iterate the same number of batches (see
    ``local_shard``'s tail padding). Returns identical global accuracy
    on every process.
    """
    if eval_step is None:
        eval_step = make_global_eval_step()
    c1 = c5 = n = 0
    for x_local, y_local in local_batches:
        x = host_local_to_global(x_local, mesh)
        y = host_local_to_global(y_local, mesh)
        t1, t5, _ = eval_step(model, state, x, y)
        c1 += int(t1)
        c5 += int(t5)
        n += int(np.prod(np.shape(y_local)) * jax.process_count())
    return c1 / max(n, 1), c5 / max(n, 1)
