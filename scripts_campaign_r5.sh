#!/bin/bash
# Round-5 quality campaign: 3-seed, 4-arm (FP / MCAQ / post-hoc PTQ /
# matched-budget PTQ) protocol on synthetic dataset v3 with the closed-loop
# budget controller (VERDICT r4 items 1+2).  Seeds run sequentially: the
# axon tunnel admits ONE process.  Logs + per-seed JSONs under evidence/r5.
set -u
cd /root/repo
export PYTHONUNBUFFERED=1
mkdir -p evidence/r5 outputs
for seed in 0 1 2; do
  out=evidence/r5/quality_seed${seed}.json
  if [ -s "$out" ]; then
    echo "seed $seed already done, skipping"
    continue
  fi
  # cool-down before EVERY seed: a process whose first device contact
  # comes <60 s after the previous tunnel holder exited (cleanly or not)
  # can stall forever on its first RPC; 3-5 min gaps are reliable
  sleep 240
  echo "=== seed $seed start $(date -u +%H:%M:%S) ==="
  timeout 14400 python -u -m mcaq_yolo_tpu.scripts.quality_evidence \
    --seed "$seed" --epochs 50 --fp-epochs 40 --n-images 192 \
    --root "outputs/q_r5_seed${seed}" --out "$out" \
    > "evidence/r5/quality_seed${seed}.log" 2>&1
  echo "=== seed $seed rc=$? end $(date -u +%H:%M:%S) ==="
done
echo CAMPAIGN_DONE
