#!/bin/bash
# Round-4 queue 2: gravity retrains under the MULTI-HORIZON open-loop
# sigma NLL (VERDICT r4 task 4).  Identical protocol to round 3's
# r3g_grav_s{21..24} (260 ep, w16/K12 sampled overshoot, sigma head,
# eval/ckpt every 20, pre-registered val-closest-to-1.0 selection); the
# ONLY delta is the new default open_loop_sigma_horizons=(1,4,8) — the
# sigma is now fit to the accumulated k-step dispersion instead of the
# 1-step residual that over-injected 1.9-3.2x on seeds 22/23.
# Done-criterion: RAW (temp=1) sampled 80-step speed ratio <= 1.3 on
# >=3/4 healthy seeds, mean ratio + mse@8 unregressed.
set -u
cd /root/repo
if [ -f /tmp/r4_queue1.pid ]; then
  while kill -0 $(cat /tmp/r4_queue1.pid) 2>/dev/null; do sleep 60; done
fi

# round ends ~17:30 UTC 2026-08-18; stop starting stages after 16:55 so
# the driver's round-end bench gets the TPU to itself
DEADLINE="${R4_DEADLINE:-1787072100}"
ddl() { if [ "$(date +%s)" -gt "$DEADLINE" ]; then
  echo "=== DEADLINE passed — skipping remaining queue2 stages ==="; exit 0
fi; }
tmo() { r=$((DEADLINE - $(date +%s))); [ "$r" -lt "$1" ] && echo "$r" || echo "$1"; }
ddl

# the 07:15 probe OOM'd scoped vmem on its tile-1024 arm (fixed by the
# vmem_limit_bytes raise in pallas_spn) — finish it if still incomplete
if ! grep -q probe_complete runs/pallas_probe.json 2>/dev/null; then
  echo "=== SPN pallas gate re-probe after vmem fix $(date +%H:%M:%S) ==="
  timeout $(tmo 1800) python scripts/pallas_probe.py 2>&1 \
    | grep -v cpu_aot_loader | tail -12
fi

ddl
# measurement for the two new fused kernels first (VERDICT r4 task 5 /
# criterion 5) — cheap and high-information if the round runs short
# (skipped if the master pipeline already ran it earlier in the chain)
if [ ! -s runs/phase_bench.json ]; then
  echo "=== phase bench (fused likelihood + scan) $(date +%H:%M:%S) ==="
  timeout $(tmo 3600) python scripts/phase_bench.py 2>&1 \
    | grep -v cpu_aot_loader | tail -25
fi

COMMON="preset=stove_gravity num_epochs=260 steps_per_epoch=20 window=16 \
overshoot_k=12 overshoot_sample=true eval_every=20 ckpt_every=20 \
ckpt_keep=99 eval_longhorizon=80 open_loop_sigma=true fused_epoch=false"

for s in 21 22 23 24; do
  ddl
  echo "=== r4g_grav_s$s (multi-horizon sigma) $(date +%H:%M:%S) ==="
  timeout $(tmo 5400) python -m stove_tpu.main $COMMON seed=$s \
    run_name=r4g_grav_s$s 2>&1 | tail -2
done

ddl
echo "=== gravity selection protocol $(date +%H:%M:%S) ==="
GS_TAG=_r4 timeout $(tmo 10800) python scripts/grav_select.py \
  runs/r4g_grav_s21 runs/r4g_grav_s22 runs/r4g_grav_s23 runs/r4g_grav_s24 \
  2>&1 | grep -v cpu_aot_loader | tail -40

echo "=== queue2 done $(date +%H:%M:%S) ==="
