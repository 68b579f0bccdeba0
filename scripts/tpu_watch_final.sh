#!/bin/bash
# Probe the tunnel; on recovery run the final headline bench with the
# current tree (grad bf16x2 default + decode fixes) and exit.
cd /root/repo
while true; do
  if timeout 90 python - <<'PY' >>/tmp/tpu_probe_final.log 2>&1
import numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((8, 8)).sum())) == 64.0
print("probe ok")
PY
  then
    echo "$(date) recovered — final bench" | tee -a /tmp/tpu_probe_final.log
    timeout 900 python bench.py > bench_logs_r4/90_final_headline.log 2>&1
    tail -3 bench_logs_r4/90_final_headline.log >> /tmp/tpu_probe_final.log
    exit 0
  fi
  echo "$(date) still wedged" >> /tmp/tpu_probe_final.log
  sleep 180
done
