#!/bin/bash
# Poll for the axon tunnel; when it answers, run the round-3 measurement
# queue (bench.py, then a 100 MB scale-pipeline validation), one TPU
# process at a time, then exit so the driving session can take over for
# the 1 GB reference-scale run. Logs: /tmp/tpu_wait.log,
# /tmp/bench_r3.log, /tmp/scale100.log.
set -u
cd /root/repo
echo "poll start at $(date)" >> /tmp/tpu_wait.log
for i in $(seq 1 2000); do
  if timeout 45 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "tunnel up at $(date)" >> /tmp/tpu_wait.log
    timeout 3600 python bench.py > /tmp/bench_r3.json 2> /tmp/bench_r3.log
    echo "bench done rc=$? at $(date)" >> /tmp/tpu_wait.log
    TGX_SCALE_MB=100 TGX_SCALE_GEN=100000 TGX_SCALE_VOCAB=32000 \
      TGX_SCALE_MERGES=500 TGX_SCALE_OUT=/tmp/BASELINE_SCALE_100.json \
      timeout 10800 python scripts/bench_scale.py > /tmp/scale100.log 2>&1
    echo "scale done rc=$? at $(date)" >> /tmp/tpu_wait.log
    exit 0
  fi
  sleep 60
done
echo "gave up at $(date)" >> /tmp/tpu_wait.log
exit 1
