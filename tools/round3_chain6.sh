#!/bin/bash
# Round-3 TPU chain, part 6: the scene-diversity lever at 960 scenes
# (VERDICT item 1 "target >=0.5" — RR scaled 0 -> 0.028 -> 0.140 ->
# 0.4216 at 16/80/192/480 scenes; x3 doubles scenes again).
# After chain5 drains: warm-start conf/3dmatch_synthx3.yaml from the
# curriculum checkpoint if chain5 produced one (it carries the
# low-overlap skill), else from the XXL 60k checkpoint; train ~24k
# steps; eval both benchmarks; final cache re-warm.
set -u
cd /root/repo
LOG=/tmp/round3_chain6.log
XXL_CKPT=logs/finegrained_reg_3dmatch_synthxxl/260817_114041/ckpt
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain6 waiting on chain5 pid $(cat /tmp/chain5.pid)"
while kill -0 "$(cat /tmp/chain5.pid)" 2>/dev/null; do sleep 30; done

CUR_CKPT=$(ls -dt logs/finegrained_reg_3dmatch_synthxxl_cur/*/ckpt 2>/dev/null | head -1)
if [ -n "$CUR_CKPT" ] && [ -f "$CUR_CKPT/checkpoints.txt" ]; then
  WARM="$CUR_CKPT"
else
  WARM="$XXL_CKPT"
fi
# niter is absolute: latest saved step + 24k more on the x3 data
LAST=$(ls "$WARM" | grep -E '^[0-9]+$' | sort -g | tail -1)
NITER=$((LAST + 24000))
note "x3 warm-start from $WARM (step $LAST) --niter $NITER"
timeout 11400 python train.py --config conf/3dmatch_synthx3.yaml \
    --resume "$WARM" --niter "$NITER" --num_workers 2 \
    --summary_every 200 --validate_every 1000 \
    > /tmp/x3_train.log 2>&1
note "x3 train rc=$?"

X3_CKPT=$(ls -dt logs/finegrained_reg_3dmatch_synthx3/*/ckpt 2>/dev/null | head -1)
if [ -n "$X3_CKPT" ]; then
  for bench in 3DMatch 3DLoMatch; do
    note "eval x3 on $bench"
    timeout 7200 python test.py --config conf/3dmatch_synthx3.yaml \
        --resume "$X3_CKPT" --benchmark "$bench" \
        > "/tmp/eval_x3_${bench}.log" 2>&1
    note "eval $bench rc=$?"
  done
fi

note "final cache re-warm"
timeout 7200 python tools/warm_caches.py > /tmp/warm_final6.log 2>&1
note "chain6 done"
