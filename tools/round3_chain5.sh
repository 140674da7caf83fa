#!/bin/bash
# Round-3 TPU chain, part 5: the low-overlap curriculum measurement
# (VERDICT item 2 "Done = one table: RR per overlap bin, before/after").
# After chain4 drains: warm-start conf/3dmatch_synthxxl_cur.yaml (train
# pairs down to 0.10 overlap) from the XXL 60k checkpoint, train 15k
# curriculum steps, then eval both benchmarks — the overlap-bin RR
# table before (plain XXL) vs after (curriculum) isolates the knob.
set -u
cd /root/repo
LOG=/tmp/round3_chain5.log
XXL_CKPT=logs/finegrained_reg_3dmatch_synthxxl/260817_114041/ckpt
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain5 waiting on chain4 pid $(cat /tmp/chain4.pid)"
while kill -0 "$(cat /tmp/chain4.pid)" 2>/dev/null; do sleep 30; done

note "curriculum warm-start from $XXL_CKPT"
timeout 9000 python train.py --config conf/3dmatch_synthxxl_cur.yaml \
    --resume "$XXL_CKPT" --niter 75000 --num_workers 2 \
    --summary_every 200 --validate_every 1000 \
    > /tmp/cur_train.log 2>&1
note "curriculum train rc=$?"

CUR_CKPT=$(ls -dt logs/finegrained_reg_3dmatch_synthxxl_cur/*/ckpt 2>/dev/null | head -1)
if [ -n "$CUR_CKPT" ]; then
  for bench in 3DLoMatch 3DMatch; do
    note "eval curriculum on $bench"
    timeout 7200 python test.py --config conf/3dmatch_synthxxl_cur.yaml \
        --resume "$CUR_CKPT" --benchmark "$bench" \
        > "/tmp/eval_cur_${bench}.log" 2>&1
    note "eval $bench rc=$?"
  done
fi

note "final cache re-warm for the driver bench"
timeout 7200 python tools/warm_caches.py > /tmp/warm_final.log 2>&1
note "chain5 done"
