#!/bin/bash
# Probe the axon tunnel with a bounded tiny fetch; when it recovers,
# run TPU queue 9 (decode-fixed restamps) once and exit.
cd /root/repo
while true; do
  if timeout 90 python - <<'PY' >>/tmp/tpu_probe9.log 2>&1
import numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((8, 8)).sum())) == 64.0
print("probe ok")
PY
  then
    echo "$(date) tunnel recovered — running queue9" | tee -a /tmp/tpu_probe9.log
    bash scripts/tpu_queue9.sh > bench_logs_r4/queue9_main.log 2>&1
    echo "$(date) queue9 done" | tee -a /tmp/tpu_probe9.log
    exit 0
  fi
  echo "$(date) still wedged" >> /tmp/tpu_probe9.log
  sleep 180
done
