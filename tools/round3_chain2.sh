#!/bin/bash
# Round-3 TPU job chain, part 2 (one TPU process at a time — CLAUDE.md).
# Takes over when the XXL 60k run (pid /tmp/xxl_train.pid) finishes:
#   1. XXL protocol evals: 3DMatch + 3DLoMatch (new 36864 bucket +
#      eval_capacity_headroom — no dropped voxels, no subsampled pairs)
#   2. approx-vs-exact kNN on the trained model (VERDICT item 9)
#   3. RANSAC-refined evals (VERDICT item 10; low-overlap is where the
#      vendored ransaclib matters upstream)
#   4. CircleLoss smoke training on TPU (1500 steps, ~5 min)
#   5. MCD end-to-end: 3000-step training + trajectory RMSE (item 4)
#   6. bench_variants gather_barrier measurement (item 5)
#   7. warm_caches for the driver's round-end bench
# Appends stage progress to /tmp/round3_chain2.log.
set -u
cd /root/repo
LOG=/tmp/round3_chain2.log
XXL_CKPT=logs/finegrained_reg_3dmatch_synthxxl/260817_114041/ckpt

note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain2 started; waiting for XXL pid $(cat /tmp/xxl_train.pid)"
while kill -0 "$(cat /tmp/xxl_train.pid)" 2>/dev/null; do sleep 30; done
note "XXL training finished"

for bench in 3DMatch 3DLoMatch; do
  note "eval XXL on $bench"
  timeout 10800 python test.py --config conf/3dmatch_synthxxl.yaml \
      --resume "$XXL_CKPT" --benchmark "$bench" \
      > "/tmp/eval_xxl_${bench}.log" 2>&1
  note "eval $bench rc=$?"
done

note "eval XXL 3DMatch exact-kNN"
timeout 10800 python test.py --config conf/3dmatch_synthxxl.yaml \
    --resume "$XXL_CKPT" --benchmark 3DMatch --exact_knn \
    > /tmp/eval_xxl_3DMatch_exact.log 2>&1
note "exact-kNN rc=$?"

for bench in 3DLoMatch 3DMatch; do
  note "eval XXL $bench + RANSAC refinement"
  timeout 10800 python test.py --config conf/3dmatch_synthxxl.yaml \
      --resume "$XXL_CKPT" --benchmark "$bench" --ransac \
      > "/tmp/eval_xxl_${bench}_ransac.log" 2>&1
  note "ransac $bench rc=$?"
done

note "circle smoke training on TPU"
timeout 3600 python train.py --config conf/modelnet_synth_circle.yaml \
    --num_workers 2 > /tmp/circle_tpu.log 2>&1
note "circle rc=$?"

note "MCD training"
timeout 10800 python train.py --config conf/mcd_synth.yaml \
    --num_workers 2 > /tmp/mcd_train.log 2>&1
note "MCD train rc=$?"
MCD_CKPT=$(ls -dt logs/finegrained_reg_mcd_synth/*/ckpt 2>/dev/null | head -1)
if [ -n "$MCD_CKPT" ]; then
  note "MCD RMSE eval ($MCD_CKPT)"
  timeout 7200 python tools/mcd/eval_mcd_rmse.py --resume "$MCD_CKPT" \
      --config conf/mcd_synth.yaml > /tmp/mcd_rmse.log 2>&1
  note "MCD RMSE rc=$?"
fi

note "bench variants (baseline + gather_barrier)"
timeout 7200 python tools/bench_variants.py \
    --only baseline,gather_barrier > /tmp/variants_r3.log 2>&1
note "variants rc=$?"

note "warming caches for round-end bench"
timeout 7200 python tools/warm_caches.py > /tmp/warm_r3.log 2>&1
note "chain2 done"
