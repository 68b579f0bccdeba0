#!/bin/bash
cd /root/repo
while true; do
  if timeout 90 python - <<'PY' >>/tmp/tpu_probe12.log 2>&1
import numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((8, 8)).sum())) == 64.0
print("probe ok")
PY
  then
    echo "$(date) recovered — queue12" | tee -a /tmp/tpu_probe12.log
    bash scripts/tpu_queue12.sh > bench_logs_r4/queue12_main.log 2>&1
    exit 0
  fi
  echo "$(date) still wedged" >> /tmp/tpu_probe12.log
  sleep 120
done
