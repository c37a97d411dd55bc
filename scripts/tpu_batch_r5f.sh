#!/bin/bash
# Round-5f TPU batch: w8a8 ViT e2e A/B (after r5e's micro). Documents
# the number either way per the kernel dispatch policy.
set -u
cd /root/repo
LOGDIR=${1:-/root/repo/.r5f_tpu}
WAITPID=${2:-}
mkdir -p "$LOGDIR"

if [ -n "$WAITPID" ]; then
  echo "$(date) waiting for pid $WAITPID" | tee -a "$LOGDIR/batch.log"
  while kill -0 "$WAITPID" 2>/dev/null; do sleep 30; done
fi

probe() {
  timeout 420 python -c "
import jax, jax.numpy as jnp, numpy as np
x = jax.jit(lambda a: (a*a).sum())(jnp.ones((128,128)))
print('ok', float(np.asarray(x)))" >>"$LOGDIR/probe.log" 2>&1
}

echo "$(date) probing tunnel" | tee -a "$LOGDIR/batch.log"
until probe; do
  echo "$(date) tunnel down, retry in 10 min" | tee -a "$LOGDIR/batch.log"
  sleep 600
done

echo "$(date) w8a8 vit e2e" | tee -a "$LOGDIR/batch.log"
timeout 2400 python scripts/ablate_int8_vit.py >"$LOGDIR/int8_vit.log" 2>&1
echo "$(date) int8_vit rc=$?" | tee -a "$LOGDIR/batch.log"
echo "$(date) batch done" | tee -a "$LOGDIR/batch.log"
