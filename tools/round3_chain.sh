#!/bin/bash
# Round-3 TPU job chain (one TPU process at a time — see CLAUDE.md).
# 1. wait for the XL 30k resume (pid in /tmp/xl_resume.pid) to finish
# 2. RR-eval the finished XL model on both benchmarks (TPU)
# 3. warm-start the 480-scene XXL run from the XL checkpoint
# Appends progress to /tmp/round3_chain.log; each stage's own log under
# logs/. Survives session crashes (setsid detached).
set -u
cd /root/repo
LOG=/tmp/round3_chain.log
XL_CKPT=logs/finegrained_reg_3dmatch_synthxl/260817_092210/ckpt

note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain started; waiting for XL pid $(cat /tmp/xl_resume.pid)"
while kill -0 "$(cat /tmp/xl_resume.pid)" 2>/dev/null; do sleep 30; done
note "XL training finished"

for bench in 3DMatch 3DLoMatch; do
  note "eval XL @30k on $bench"
  timeout 7200 python test.py --config conf/3dmatch_synthxl.yaml \
      --resume "$XL_CKPT" --benchmark "$bench" \
      > "/tmp/eval_xl30k_${bench}.log" 2>&1
  note "eval $bench rc=$?"
done

note "launching XXL warm-start"
python train.py --config conf/3dmatch_synthxxl.yaml \
    --resume "$XL_CKPT" --niter 60000 --num_workers 2 \
    --summary_every 200 --validate_every 1000 \
    > /tmp/xxl_train.log 2>&1 &
echo $! > /tmp/xxl_train.pid
note "XXL pid $(cat /tmp/xxl_train.pid)"
wait
note "XXL training finished rc=$?"
