#!/bin/bash
cd /root/repo
echo "=== EXTENDED BILLIARDS (restore big_bil, 240 more epochs) ==="
timeout 4500 python -m stove_tpu.main restore=runs/big_bil reward_head=false \
  num_epochs=360 eval_every=30 ckpt_every=60 2>&1 | grep -v WARNING | tail -5
echo "=== EXT DONE ==="
