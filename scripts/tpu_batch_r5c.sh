#!/bin/bash
# Round-5 third TPU batch: (1) ablate_vit9 LN-fold A/B with the parity
# check traced under matmul precision 'float32' (the r5b run tripped the
# parity assert on TPU DEFAULT-precision bf16 rounding skew, 1.55e-2 —
# not a wrong transform); (2) verify bench.py's pure-XLA baseline fix on
# the config that crashed it (swin_v2_b: vmapped v2 whole-block kernel
# broke Mosaic in the old kernel-tainted baseline; expect a real
# vs_baseline ratio now). Same wedge protocol as tpu_batch_r5.sh.
set -u
cd /root/repo
LOGDIR=${1:-/root/repo/.r5c_tpu}
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

echo "$(date) ablate_vit9 (LN fold A/B, f32-precision parity)" | tee -a "$LOGDIR/batch.log"
timeout 3600 python scripts/ablate_vit9.py >"$LOGDIR/vit9.log" 2>&1
echo "$(date) vit9 rc=$?" | tee -a "$LOGDIR/batch.log"
sleep 120

echo "$(date) bench swin_v2_b (pure-XLA baseline verification)" | tee -a "$LOGDIR/batch.log"
EQXTPU_BENCH_MODEL=swin_v2_b timeout 2400 python bench.py >"$LOGDIR/bench_v2b.json" 2>"$LOGDIR/bench_v2b.log"
echo "$(date) bench_v2b rc=$?" | tee -a "$LOGDIR/batch.log"
echo "$(date) batch done" | tee -a "$LOGDIR/batch.log"
