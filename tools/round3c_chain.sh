#!/bin/bash
# Round-3c training chain (second VM reset recovery; see STATUS.md).
# Stage 1: scratch on the surviving 192-scene synthxl data with x3
#          capacities (shares the compiled program with stage 2).
# Stage 2: when the regenerated 960-scene x3 dataset is ready
#          (/tmp/x3_ready from round3c_regen.sh), warm-start the x3
#          low-overlap curriculum config from stage 1's best and train
#          to the wall deadline.
# Best params are mirrored to results/snapshots/*.npz on every
# new-best validation (committed separately so a reset cannot lose
# the model).
set -u
cd /root/repo
LOG=/tmp/round3c_chain.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

TRAIN_DEADLINE=$(( $(date +%s) + ${TRAIN_BUDGET_S:-13500} ))
note "chain start; train deadline in $(( TRAIN_DEADLINE - $(date +%s) ))s"

# ---- stage 1: scratch on synthxl data ----
note "stage 1: scratch train on synthxl (x3 capacities)"
(setsid nohup python train.py --config conf/3dmatch_synthxl_warm.yaml \
    --niter 60000 --num_workers 2 --summary_every 200 \
    --validate_every 1000 > /tmp/s1_train.log 2>&1 & echo $! > /tmp/s1.pid)

# wait for the x3 data (or the deadline)
while [ ! -f /tmp/x3_ready ]; do
  if [ "$(date +%s)" -gt "$TRAIN_DEADLINE" ]; then
    note "deadline before x3 data; stopping stage 1"
    kill "$(cat /tmp/s1.pid)" 2>/dev/null
    exit 0
  fi
  kill -0 "$(cat /tmp/s1.pid)" 2>/dev/null || { note "stage 1 died early"; break; }
  sleep 60
done

if [ -f /tmp/x3_ready ]; then
  note "x3 data ready; letting stage 1 reach its next validation"
  sleep 360
  kill "$(cat /tmp/s1.pid)" 2>/dev/null
  for i in $(seq 30); do
    kill -0 "$(cat /tmp/s1.pid)" 2>/dev/null || break; sleep 10
  done
  kill -9 "$(cat /tmp/s1.pid)" 2>/dev/null
  sleep 30
  # killed a TPU process: gate stage 2 on the tunnel answering
  for i in $(seq 20); do
    if timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK"; then
      note "tunnel OK after stage-1 kill (try $i)"; break
    fi
    note "tunnel not answering (try $i)"; sleep 60
  done

  S1_CKPT=$(ls -dt logs/finegrained_reg_3dmatch_synthxl_w/*/ckpt 2>/dev/null | head -1)
  note "stage 1 ckpt: $S1_CKPT"
  LAST=$(ls "$S1_CKPT" 2>/dev/null | grep -E '^[0-9]+$' | sort -g | tail -1)
  LAST=${LAST:-0}
  BUDGET_S=$(( TRAIN_DEADLINE - $(date +%s) ))
  if [ "$BUDGET_S" -gt 600 ]; then
    NITER=$(( LAST + BUDGET_S * 5 / 2 ))
    note "stage 2: x3_cur warm-start from step $LAST, niter $NITER, ${BUDGET_S}s"
    timeout "$BUDGET_S" python train.py --config conf/3dmatch_synthx3_cur.yaml \
        --resume "$S1_CKPT" --niter "$NITER" --num_workers 2 \
        --summary_every 200 --validate_every 1000 \
        > /tmp/s2_train.log 2>&1
    note "stage 2 rc=$?"
  fi
fi
note "chain done"
