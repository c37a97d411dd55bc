#!/bin/bash
# Round-5 follow-up TPU batch: re-run the LN-fold A/B (the first attempt
# hit the tunnel's remote_compile HTTP 413 limit — jit of a bound method
# baked 344MB of vit_base params into the HLO; fixed by passing models
# as traced arguments), plus the never-recorded int8 serving A/B.
# Same wedge protocol as tpu_batch_r5.sh: bounded probe, spaced jobs.
set -u
cd /root/repo
LOGDIR=${1:-/root/repo/.r5b_tpu}
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

echo "$(date) ablate_vit9 (LN fold A/B, arg-passing fix)" | tee -a "$LOGDIR/batch.log"
timeout 3600 python scripts/ablate_vit9.py >"$LOGDIR/vit9.log" 2>&1
echo "$(date) vit9 rc=$?" | tee -a "$LOGDIR/batch.log"
sleep 120

echo "$(date) ablate_int8 (weight-only int8 serving A/B)" | tee -a "$LOGDIR/batch.log"
timeout 2400 python scripts/ablate_int8.py >"$LOGDIR/int8.log" 2>&1
echo "$(date) int8 rc=$?" | tee -a "$LOGDIR/batch.log"
echo "$(date) batch done" | tee -a "$LOGDIR/batch.log"
