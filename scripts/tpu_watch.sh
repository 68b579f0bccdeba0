#!/bin/bash
# Probe the axon tunnel with a bounded tiny fetch; when it recovers,
# run the round-3 TPU work queue once and exit.
cd /root/repo
while true; do
  if timeout 90 python - <<'PY' >>/tmp/tpu_probe.log 2>&1
import numpy as np, jax.numpy as jnp
assert float(np.asarray(jnp.ones((8, 8)).sum())) == 64.0
print("probe ok")
PY
  then
    echo "$(date) tunnel recovered — running queue" | tee -a /tmp/tpu_probe.log
    bash scripts/tpu_queue.sh >/tmp/tpu_queue_run.log 2>&1
    echo "$(date) queue done" | tee -a /tmp/tpu_probe.log
    exit 0
  fi
  echo "$(date) still wedged" >> /tmp/tpu_probe.log
  sleep 300
done
