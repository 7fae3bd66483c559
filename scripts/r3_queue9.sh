#!/bin/bash
# Round-3 queue 9: train-step throughput on REAL billiards frames (the
# uniform-noise default was round-2 weak #6: activation stats and overlap
# chains differ on noise).  Paired same-session with the noise run for an
# apples-to-apples delta.  Runs after queue8.
set -u
cd /root/repo
while kill -0 $(cat /tmp/r3_queue8.pid) 2>/dev/null; do sleep 60; done

echo "=== bench --train (noise) $(date +%H:%M:%S) ==="
timeout 2400 python bench.py --train --quick 2>&1 | tail -4
echo "=== bench --train --real-data $(date +%H:%M:%S) ==="
timeout 2400 python bench.py --train --real-data --quick 2>&1 | tail -4
echo "=== queue9 done $(date +%H:%M:%S) ==="
