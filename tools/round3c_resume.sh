#!/bin/bash
# Adaptive tail trainer: if wall-clock remains after round3c_evals.sh
# (/tmp/evals_done), resume the x3 curriculum run from its latest
# checkpoint for BUDGET more seconds, then re-run the two RR evals and
# commit artifacts. Usage: BUDGET=7200 bash tools/round3c_resume.sh
set -u
cd /root/repo
LOG=/tmp/round3c_resume.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
BUDGET=${BUDGET:-5400}

[ -f /tmp/evals_done ] || { note "evals not done; refusing"; exit 1; }
timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK" || { note "TPU down"; exit 1; }

CKPT=$(ls -dt logs/finegrained_reg_3dmatch_synthx3_cur/*/ckpt 2>/dev/null | head -1)
[ -z "$CKPT" ] && { note "no x3_cur ckpt"; exit 1; }
LAST=$(ls "$CKPT" | grep -E '^[0-9]+$' | sort -g | tail -1); LAST=${LAST:-0}
NITER=$(( LAST + BUDGET * 5 / 2 ))
note "resume from step $LAST, niter $NITER, ${BUDGET}s"
timeout "$BUDGET" python train.py --config conf/3dmatch_synthx3_cur.yaml \
    --resume "$CKPT" --niter "$NITER" --num_workers 2 \
    --summary_every 200 --validate_every 1000 > /tmp/resume_train.log 2>&1
note "train rc=$?"
sleep 20
for i in $(seq 20); do
  timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK" && break
  note "tunnel wait ($i)"; sleep 60
done

git add results/snapshots >/dev/null 2>&1 && \
  git commit -q -m "results: flagship snapshot after extended training" || true

SNAP=results/snapshots/finegrained_reg_3dmatch_synthx3_cur_best.npz
for tag_bench in "r3c_3DMatch_ext 3DMatch" "r3c_3DLoMatch_ext 3DLoMatch"; do
  set -- $tag_bench
  note "eval $1"
  timeout 5400 python test.py --resume "$SNAP" --benchmark "$2" \
      --config conf/3dmatch_synthx3_cur.yaml > "/tmp/eval_$1.log" 2>&1
  note "eval $1 rc=$?"
  d=$(ls -dt logs/*_eval/2* 2>/dev/null | head -1)
  [ -n "$d" ] && cp "$d/log.txt" "results/evals/$1.log" 2>/dev/null
  tail -25 "/tmp/eval_$1.log" >> "results/evals/$1.log" 2>/dev/null || true
done
git add results >/dev/null 2>&1 && \
  git commit -q -m "results: extended-training RR evals" || true
note "done"
