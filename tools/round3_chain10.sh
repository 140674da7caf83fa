#!/bin/bash
# Round-3 TPU chain, part 10 — pose-selection evals (queued behind
# chain9): test.py --ransac_select on the best trained checkpoint,
# both benchmarks, to show selection captures the best of the learned
# pose (high-overlap) and RANSAC (low-overlap) regimes.
set -u
cd /root/repo
LOG=/tmp/round3_chain10.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain10 waiting on chain9 pid $(cat /tmp/chain9.pid)"
while kill -0 "$(cat /tmp/chain9.pid)" 2>/dev/null; do sleep 30; done

CKPT=""
for d in logs/finegrained_reg_3dmatch_synthx3 \
         logs/finegrained_reg_3dmatch_synthxxl_cur; do
  c=$(ls -dt "$d"/*/ckpt 2>/dev/null | head -1)
  if [ -n "$c" ] && [ -f "$c/checkpoints.txt" ]; then CKPT="$c"; break; fi
done
if [ -z "$CKPT" ]; then note "no checkpoint; abort"; exit 1; fi

for bench in 3DLoMatch 3DMatch; do
  note "ransac_select eval on $bench ($CKPT)"
  timeout 7200 python test.py --resume "$CKPT" --benchmark "$bench" \
      --ransac_select > "/tmp/eval_select_${bench}.log" 2>&1
  note "select $bench rc=$?"
done
note "chain10 done"
