#!/bin/bash
# Round-5 TPU measurement batch. One long-lived parent; spaced, timeout-
# bounded probes while the tunnel is wedged (CLAUDE.md wedge protocol),
# then the three measurement jobs sequentially with cool-down gaps.
set -u
cd /root/repo
LOGDIR=${1:-/root/repo/.r5_tpu}
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

echo "$(date) ablate_vit9 (LN fold A/B)" | tee -a "$LOGDIR/batch.log"
timeout 2400 python scripts/ablate_vit9.py >"$LOGDIR/vit9.log" 2>&1
echo "$(date) vit9 rc=$?" | tee -a "$LOGDIR/batch.log"
sleep 120

echo "$(date) ablate_swin12 (deep-variant gates)" | tee -a "$LOGDIR/batch.log"
timeout 5400 python scripts/ablate_swin12.py >"$LOGDIR/swin12.log" 2>&1
echo "$(date) swin12 rc=$?" | tee -a "$LOGDIR/batch.log"
sleep 120

echo "$(date) bench sweep (driver-grade protocol)" | tee -a "$LOGDIR/batch.log"
timeout 10800 python bench.py >"$LOGDIR/bench.json" 2>"$LOGDIR/bench.log"
echo "$(date) bench rc=$?" | tee -a "$LOGDIR/batch.log"
echo "$(date) batch done" | tee -a "$LOGDIR/batch.log"
