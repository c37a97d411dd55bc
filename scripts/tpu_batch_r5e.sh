#!/bin/bash
# Round-5e TPU batch: runs AFTER the r5d bench sweep exits.
#  1. ablate_int8_act.py — can XLA's int8 dot beat the 174 TF/s bf16
#     matmul ceiling (v5e int8 MXU peak is 2x)?
#  2. bench_train.py — refresh the round-3-era training throughput
#     records under the current code.
#  3. train_imagenet.py --synthetic on the real chip — the production
#     training CLI end-to-end on TPU (resnet50 b64 bf16).
# Same wedge protocol as tpu_batch_r5.sh: probe under timeout, few
# long-lived processes.
set -u
cd /root/repo
LOGDIR=${1:-/root/repo/.r5e_tpu}
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
echo "$(date) tunnel up" | tee -a "$LOGDIR/batch.log"

echo "$(date) int8 activation micro" | tee -a "$LOGDIR/batch.log"
timeout 1800 python scripts/ablate_int8_act.py >"$LOGDIR/int8_act.log" 2>&1
echo "$(date) int8 rc=$?" | tee -a "$LOGDIR/batch.log"
sleep 60

echo "$(date) train throughput refresh" | tee -a "$LOGDIR/batch.log"
timeout 5400 python scripts/bench_train.py >"$LOGDIR/bench_train.json" 2>"$LOGDIR/bench_train.log"
echo "$(date) bench_train rc=$?" | tee -a "$LOGDIR/batch.log"
sleep 60

echo "$(date) train CLI smoke on TPU" | tee -a "$LOGDIR/batch.log"
timeout 1800 python scripts/train_imagenet.py --model resnet50 --synthetic 6 \
  --batch-size 64 --canvas 232 --crop 224 --epochs 1 --warmup-epochs 0 \
  --lr 0.1 --bf16 --mixup 0.2 --log-every 2 >"$LOGDIR/train_cli.log" 2>&1
echo "$(date) train_cli rc=$?" | tee -a "$LOGDIR/batch.log"
echo "$(date) batch done" | tee -a "$LOGDIR/batch.log"
