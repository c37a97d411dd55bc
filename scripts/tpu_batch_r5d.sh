#!/bin/bash
# Round-5 final verification sweep: full `python bench.py` (parity gate
# + all BASELINE configs) after the pure-XLA baseline fix, i.e. exactly
# the command and code path the round driver runs for BENCH_r05. Also
# refreshes every config's vs_baseline ratio under the kernel-free
# baseline (pre-r5 ratios were conservative for the kernel families).
# Same wedge protocol as tpu_batch_r5.sh.
set -u
cd /root/repo
LOGDIR=${1:-/root/repo/.r5d_tpu}
mkdir -p "$LOGDIR"

probe() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jax.jit(lambda a: (a*a).sum())(jnp.ones((128,128)))
print('ok', float(np.asarray(x)))" >>"$LOGDIR/probe.log" 2>&1
}

echo "$(date) waiting for tunnel" | tee -a "$LOGDIR/batch.log"
until probe; do
  echo "$(date) tunnel down, retry in 10 min" | tee -a "$LOGDIR/batch.log"
  sleep 600
done
echo "$(date) tunnel up" | tee -a "$LOGDIR/batch.log"

echo "$(date) bench sweep (driver protocol, pure-XLA baseline)" | tee -a "$LOGDIR/batch.log"
timeout 10800 python bench.py >"$LOGDIR/bench.json" 2>"$LOGDIR/bench.log"
echo "$(date) bench rc=$?" | tee -a "$LOGDIR/batch.log"
echo "$(date) batch done" | tee -a "$LOGDIR/batch.log"
