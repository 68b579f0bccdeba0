#!/bin/bash
# Round-4 TPU queue, part 8: restamp the hi-fi RD rows from honest runs
# (legacy row unreproducible; see scripts/probe_hifi.py docstring).
set -x
cd /root/repo
mkdir -p bench_logs_r4
L=bench_logs_r4
timeout 3600 python scripts/probe_hifi.py \
    >$L/70_hifi_restamp.log 2>&1; tail -8 $L/70_hifi_restamp.log
echo "QUEUE8 DONE $(date)"
