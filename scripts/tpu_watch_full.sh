#!/bin/bash
# Probe the tunnel; on recovery validate bench_full's quality-gated
# decode end-to-end (the r4 bench change) and exit.
cd /root/repo
while true; do
  if timeout 90 python - <<'PY' >>/tmp/tpu_probe_full.log 2>&1
import numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((8, 8)).sum())) == 64.0
print("probe ok")
PY
  then
    echo "$(date) recovered — full256 tier-decode bench" | tee -a /tmp/tpu_probe_full.log
    timeout 900 env BENCH_MODE=full BENCH_OMEGA=3000 BENCH_LR=3e-4 \
        BENCH_CLIP=1.0 python bench.py \
        > bench_logs_r4/91_full256_tierdecode.log 2>&1
    tail -4 bench_logs_r4/91_full256_tierdecode.log >> /tmp/tpu_probe_full.log
    exit 0
  fi
  echo "$(date) still wedged" >> /tmp/tpu_probe_full.log
  sleep 180
done
