#!/bin/bash
# Round-3 TPU chain, part 8 — banded-kNN measurement (DESIGN.md §13):
#   1. pairs/s of the banded variants at the 12k bench bucket
#   2. accuracy validation: RR with --knn_band 0.34 on the best
#      trained checkpoint vs its recorded unbanded RR
# Queued behind chain7 (one TPU process at a time).
set -u
cd /root/repo
LOG=/tmp/round3_chain8.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain8 waiting on chain7 pid $(cat /tmp/chain7.pid)"
while kill -0 "$(cat /tmp/chain7.pid)" 2>/dev/null; do sleep 30; done

# ---- 1. banded bench variants ----
note "bench variants banded_034_L0,banded_034,banded_025"
timeout 9000 python tools/bench_variants.py \
    --only banded_034_L0,banded_034,banded_025 \
    > /tmp/variants_banded.log 2>&1
note "banded variants rc=$?"

# ---- 2. banded accuracy on the best trained model ----
CKPT=""
for d in logs/finegrained_reg_3dmatch_synthx3 \
         logs/finegrained_reg_3dmatch_synthxxl_cur \
         logs/finegrained_reg_3dmatch_synthxxl; do
  c=$(ls -dt "$d"/*/ckpt 2>/dev/null | head -1)
  if [ -n "$c" ] && [ -f "$c/checkpoints.txt" ]; then CKPT="$c"; break; fi
done
if [ -n "$CKPT" ]; then
  note "banded eval (3DMatch, --knn_band 0.34) on $CKPT"
  timeout 7200 python test.py --resume "$CKPT" --benchmark 3DMatch \
      --knn_band 0.34 > /tmp/eval_banded_3DMatch.log 2>&1
  note "banded eval rc=$?"
else
  note "no checkpoint with checkpoints.txt found; skipping banded eval"
fi
note "chain8 done"
