#!/bin/bash
# Round-3b recovery chain (the VM reset erased logs/, all checkpoints,
# and the compile caches; datasets regenerate from seeds). Two-stage
# retrain of the flagship:
#   stage 1: scratch on the surviving 192-scene synthxl data (same
#            capacities as x3 so the compiled program is shared) while
#            the 960-scene x3 dataset regenerates on the single core;
#   stage 2: when x3 data is ready, warm-start the x3 curriculum
#            config from stage 1's checkpoint and train to the wall
#            budget; then eval both benchmarks.
# Best params are mirrored to results/snapshots/ (git-trackable) at
# every new-best validation, so another reset cannot lose the model.
set -u
cd /root/repo
LOG=/tmp/round3b_chain1.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

# stage-2 end time: absolute wall deadline for training (leave ~2.5h
# of the ~12h round for evals + MCD + cache re-warm + bench)
TRAIN_DEADLINE=$(( $(date +%s) + 8*3600 ))

note "waiting for warm_caches (pid $(cat /tmp/warm.pid))"
while kill -0 "$(cat /tmp/warm.pid)" 2>/dev/null; do sleep 20; done

# ---- stage 1: scratch on synthxl data ----
note "stage 1: scratch train on synthxl (x3 capacities)"
(setsid nohup python train.py --config conf/3dmatch_synthxl_warm.yaml \
    --niter 60000 --num_workers 2 --summary_every 200 \
    --validate_every 1000 > /tmp/s1_train.log 2>&1 & echo $! > /tmp/s1.pid)

# wait for the x3 generator to finish AND its outputs to exist
while kill -0 "$(cat /tmp/gen_x3.pid)" 2>/dev/null; do sleep 60; done
if [ ! -f datasets/3dmatch_synthx3/data/train_cur_pairs-overlapmask.h5 ]; then
  note "x3 generation FAILED (no train_cur h5) — keeping stage 1 running"
  # fall through: stage 1 keeps training on xl; evals will use it
  while kill -0 "$(cat /tmp/s1.pid)" 2>/dev/null; do
    [ "$(date +%s)" -gt "$TRAIN_DEADLINE" ] && kill "$(cat /tmp/s1.pid)"
    sleep 60
  done
else
  note "x3 data ready; letting stage 1 reach its next checkpoint"
  sleep 360   # ~1 validate_every interval so the kill loses little
  kill "$(cat /tmp/s1.pid)" 2>/dev/null
  for i in $(seq 30); do
    kill -0 "$(cat /tmp/s1.pid)" 2>/dev/null || break; sleep 10
  done
  kill -9 "$(cat /tmp/s1.pid)" 2>/dev/null
  sleep 20

  S1_CKPT=$(ls -dt logs/finegrained_reg_3dmatch_synthxl_w/*/ckpt 2>/dev/null | head -1)
  note "stage 1 done; ckpt=$S1_CKPT"

  # ---- stage 2: x3 curriculum warm-start ----
  LAST=$(ls "$S1_CKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -g | tail -1)
  LAST=${LAST:-0}
  BUDGET_S=$(( TRAIN_DEADLINE - $(date +%s) ))
  # ~2.5 it/s at the 16k bucket
  NITER=$(( LAST + BUDGET_S * 5 / 2 ))
  note "stage 2: x3_cur warm-start from step $LAST, niter $NITER, ${BUDGET_S}s budget"
  timeout "$BUDGET_S" python train.py --config conf/3dmatch_synthx3_cur.yaml \
      --resume "$S1_CKPT" --niter "$NITER" --num_workers 2 \
      --summary_every 200 --validate_every 1000 \
      > /tmp/s2_train.log 2>&1
  note "stage 2 rc=$?"
fi

# ---- evals on the best surviving model ----
CKPT=""
for d in logs/finegrained_reg_3dmatch_synthx3_cur \
         logs/finegrained_reg_3dmatch_synthxl_w; do
  c=$(ls -dt "$d"/*/ckpt 2>/dev/null | head -1)
  if [ -n "$c" ] && [ -f "$c/checkpoints.txt" ]; then CKPT="$c"; break; fi
done
if [ -n "$CKPT" ]; then
  mkdir -p results
  for bench in 3DMatch 3DLoMatch; do
    note "eval $bench on $CKPT"
    timeout 7200 python test.py --resume "$CKPT" --benchmark "$bench" \
        > "results/eval_r3b_${bench}.log" 2>&1
    note "eval $bench rc=$?"
  done
fi
note "chain1 done"
