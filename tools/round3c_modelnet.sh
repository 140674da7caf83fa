#!/bin/bash
# Optional round-3c tail job: retrain ModelNet-synth (the round-2
# model was erased with the VM) so a tracked snapshot + fresh protocol
# numbers exist. Launched manually only if wall-clock remains after
# round3c_evals.sh finishes (/tmp/evals_done).
set -u
cd /root/repo
LOG=/tmp/round3c_modelnet.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
NITER=${NITER:-20000}
BUDGET=${BUDGET:-7200}

[ -f /tmp/modelnet_ready ] || { note "modelnet data missing"; exit 1; }
timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK" || { note "TPU down"; exit 1; }

note "train modelnet_synth niter=$NITER budget=${BUDGET}s"
timeout "$BUDGET" python train.py --config conf/modelnet_synth.yaml \
    --niter "$NITER" --num_workers 2 --summary_every 200 \
    --validate_every 1000 > /tmp/mn_train.log 2>&1
note "train rc=$?"

SNAP=results/snapshots/finegrained_reg_modelnet_synth_best.npz
[ -f "$SNAP" ] || SNAP=$(ls -dt logs/*modelnet_synth/2*/ckpt 2>/dev/null | head -1)
[ -z "$SNAP" ] && { note "no model"; exit 1; }
git add results/snapshots >/dev/null 2>&1 && git commit -q -m "results: modelnet-synth retrain snapshot (round 3c)" || true

mkdir -p results/evals
for b in ModelNet ModelLoNet; do
  note "eval $b"
  timeout 3600 python test.py --resume "$SNAP" --benchmark "$b" \
      --config conf/modelnet_synth.yaml > "/tmp/eval_mn_${b}.log" 2>&1
  note "eval $b rc=$?"
  d=$(ls -dt logs/*_eval/2* 2>/dev/null | head -1)
  [ -n "$d" ] && cp "$d/log.txt" "results/evals/r3c_${b}.log" 2>/dev/null
  tail -25 "/tmp/eval_mn_${b}.log" >> "results/evals/r3c_${b}.log" 2>/dev/null || true
done
git add results >/dev/null 2>&1 && git commit -q -m "results: modelnet-synth round-3c eval artifacts" || true
note "done"
