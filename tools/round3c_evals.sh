#!/bin/bash
# Round-3c post-training TPU queue: waits for round3c_chain.sh, then
# runs the full evidence suite on the retrained flagship and copies
# every artifact into git-tracked results/.
#   1. 3DMatch + 3DLoMatch RR evals (ship config)
#   2. Morton-banded kNN: bench variants + RR-neutrality eval
#   3. MCD-synth: short train + evo APE RMSE
#   4. warm bench.py cache + a local bench run
set -u
cd /root/repo
LOG=/tmp/round3c_evals.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
probe() {
  for i in $(seq 30); do
    if timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK"; then
      note "TPU OK (try $i)"; return 0
    fi
    note "TPU not answering (try $i)"; sleep 60
  done
  note "TPU never answered"; return 1
}

note "waiting for training chain (pid $(cat /tmp/chain.pid))"
while kill -0 "$(cat /tmp/chain.pid)" 2>/dev/null; do sleep 60; done
# the chain's stage-2 timeout may have killed a TPU process
sleep 30; probe || exit 1

# best model: prefer the stage-2 (x3 curriculum) snapshot
SNAP=""
for name in finegrained_reg_3dmatch_synthx3_cur finegrained_reg_3dmatch_synthxl_w; do
  [ -f "results/snapshots/${name}_best.npz" ] && { SNAP="results/snapshots/${name}_best.npz"; break; }
done
[ -z "$SNAP" ] && { note "no snapshot found"; exit 1; }
note "model: $SNAP"
mkdir -p results/evals
# durably commit the trained params before anything else (a reset
# during evals must not lose the model again)
git add results/snapshots >/dev/null 2>&1 && \
  git commit -q -m "results: trained flagship params snapshot (round-3c retrain)" || true

run_eval() { # name, extra args...
  local tag=$1; shift
  note "eval $tag start"
  timeout 5400 python test.py --resume "$SNAP" "$@" > "/tmp/eval_${tag}.log" 2>&1
  note "eval $tag rc=$?"
  local d=$(ls -dt logs/*_eval/2* 2>/dev/null | head -1)
  [ -n "$d" ] && cp "$d/log.txt" "results/evals/${tag}.log" 2>/dev/null
  tail -25 "/tmp/eval_${tag}.log" >> "results/evals/${tag}.log" 2>/dev/null || true
}

run_eval r3c_3DMatch   --benchmark 3DMatch   --config conf/3dmatch_synthx3_cur.yaml
run_eval r3c_3DLoMatch --benchmark 3DLoMatch --config conf/3dmatch_synthx3_cur.yaml

# pose-selection protocol (learned-vs-RANSAC per pair) on the
# low-overlap split — round-3a's chain10 queued this but the reset
# erased the run
run_eval r3c_3DLoMatch_rsel --benchmark 3DLoMatch --config conf/3dmatch_synthx3_cur.yaml --ransac_select

# banded-kNN accuracy validation (RR delta vs the ship config)
run_eval r3c_3DMatch_banded --benchmark 3DMatch --config conf/3dmatch_synthx3_cur.yaml --knn_band 0.34

# banded-kNN perf measurement
note "bench variants (ship vs banded)"
timeout 3600 python tools/bench_variants.py --iters 10 \
  --only baseline,banded_034,banded_034_L0 > results/evals/r3c_bench_variants.log 2>&1
note "bench variants rc=$?"

# MCD end-to-end (short train + evo RMSE), if the data regenerated
if [ -f /tmp/mcd_ready ]; then
  note "MCD train"
  timeout 4500 python train.py --config conf/mcd_synth.yaml --niter 3000 \
    --num_workers 2 --summary_every 200 --validate_every 500 \
    > /tmp/mcd_train.log 2>&1
  note "MCD train rc=$?"
  MSNAP=results/snapshots/mcd_synth_best.npz
  [ -f "$MSNAP" ] || MSNAP=$(ls -dt logs/*mcd*/2*/ckpt 2>/dev/null | head -1)
  if [ -n "$MSNAP" ]; then
    timeout 2400 python tools/mcd/eval_mcd_rmse.py --resume "$MSNAP" \
      --config conf/mcd_synth.yaml --out_dir results/evals/mcd_rmse \
      > /tmp/mcd_eval.log 2>&1
    note "MCD rmse rc=$?"; tail -12 /tmp/mcd_eval.log >> results/evals/r3c_mcd.log
  fi
else
  note "MCD data not ready; skipped"
fi

# warm the bench program cache, then one local bench run for the record
note "warm caches"
timeout 3600 python tools/warm_caches.py > /tmp/warm2.log 2>&1
note "warm rc=$?"
timeout 1800 python bench.py > results/evals/r3c_bench.json 2>/tmp/bench_err.log
note "bench rc=$?: $(cat results/evals/r3c_bench.json 2>/dev/null | tail -1)"
# commit every artifact
git add results >/dev/null 2>&1 && \
  git commit -q -m "results: round-3c eval artifacts (RR, banded-kNN validation, MCD RMSE, bench)" || true
touch /tmp/evals_done
note "evals done"
