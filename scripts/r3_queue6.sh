#!/bin/bash
# Round-3 queue 6: s14 rescue variants (the 0.3x-restart cycle rescued s12
# into the basin but left s14 flat — probe a full-LR restart and a restart
# from the linear-lever checkpoint).  Runs after queue5.
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue5.pid) 2>/dev/null; do sleep 60; done

echo "=== s14 rescue: full-LR restart (cosine ckpt) $(date +%H:%M:%S) ==="
timeout 1500 python scripts/anneal_cycle.py runs/r3c_bil_s14 120 1.0 f 2>&1 | tail -2

echo "=== s14 rescue: 0.3x restart from the LINEAR ckpt (ep 239) $(date +%H:%M:%S) ==="
timeout 1500 python scripts/anneal_cycle.py runs/r3a_bil_s14 120 0.3 2>&1 | tail -2

echo "=== queue6 done $(date +%H:%M:%S) ==="
