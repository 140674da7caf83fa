#!/bin/bash
# Round-4 endgame (supersedes round3e_endgame.sh): post-training TPU
# queue under the remaining wall clock, ordered by VERDICT round-4
# priority:
#   1. durably commit the trained snapshot
#   2. bench.py once (warm; the driver reruns it after round end)
#   3. 3DMatch RR eval          (VERDICT item 1 evidence)
#   4. 3DLoMatch RR eval        (item 1; rides the same program)
#   5. banded-kNN 3DMatch RR    (item 3: ship-or-close on a trained model)
#   6. RANSAC 3DLoMatch RR      (item 5: low-overlap serving recipe)
#   7. batch2/batch4 bench      (item 4: batch-amortized throughput)
#   8. rsel 3DLoMatch RR        (item 5b)
#   9. decoder-variant smoke    (item 7: last never-trained path)
# Each step is budget-capped against END_TS and skipped if the window
# closed; the tunnel is probed between TPU steps (wedge containment).
set -u
cd /root/repo
LOG=/tmp/round4_endgame.log
END_TS=${END_TS:-$(( $(date +%s) + 7200 ))}   # round end minus safety margin
# Hard cap: the driver's own end-of-round bench.py must never overlap
# our TPU queue (two JAX processes wedge the tunnel — that's how
# BENCH_r03 was lost). A hard-coded default cap went stale across TWO
# restarts in a row (00:18 for the 16:26 start, then 02:31 for the
# 19:55 restart) and would have skipped every eval each time — so the
# default is now NO extra clamp: the caller (round4_bootstrap.sh)
# already passes END_TS = ROUND_END_TS - 120, which is deadline-aware
# by construction. Set CAP_TS explicitly only to tighten further.
CAP=${CAP_TS:-$END_TS}
[ "$END_TS" -gt "$CAP" ] && END_TS=$CAP
# File-based cap: lets the operator tighten the deadline AFTER the
# bootstrap chain is already in flight (its env is frozen at launch).
# Written when a better round-end estimate exists (e.g. derived from
# PROGRESS.jsonl wall_s) than the one the bootstrap was started with.
if [ -s /tmp/r4_cap_ts ]; then
  FCAP=$(cat /tmp/r4_cap_ts)
  case "$FCAP" in (*[!0-9]*|'') ;; (*)
    [ "$END_TS" -gt "$FCAP" ] && { END_TS=$FCAP; } ;;
  esac
fi
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
left() { echo $(( END_TS - $(date +%s) )); }
probe() {
  for i in $(seq "${1:-30}"); do
    if timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK"; then
      note "TPU OK (try $i)"; return 0
    fi
    note "TPU not answering (try $i)"; sleep 60
  done
  note "TPU never answered"; return 1
}

note "r4 queue: waiting for training chain (pid $(cat /tmp/chain.pid))"
while kill -0 "$(cat /tmp/chain.pid)" 2>/dev/null; do sleep 60; done
sleep 30; probe 30 || exit 1

# Pick the flagship snapshot with the HIGHEST training step (not a
# fixed lineage preference): in a reset-shortened window stage A keeps
# training under the synthxl_w prefix and stage B may never start, so
# a fixed x3_cur-first order would eval a stale mirror and throw away
# the round's training. Tie-break: best before latest.
SNAP=$(python - <<'PYEOF'
import numpy as np, glob
best, best_key = "", (-1, 0)
for f in sorted(glob.glob('results/snapshots/finegrained_reg_3dmatch_synth*_{best,latest}.npz'.replace('{best,latest}','*'))):
    kind = 1 if f.endswith('_best.npz') else 0
    try:
        step = int(np.load(f, allow_pickle=True)['__step__'])
    except Exception:
        continue
    if (step, kind) > best_key:
        best_key, best = (step, kind), f
print(best)
PYEOF
)
[ -z "$SNAP" ] && { note "no snapshot found"; exit 1; }
note "model: $SNAP ($(left))s left"
mkdir -p results/evals
git add results/snapshots >/dev/null 2>&1 && \
  git commit -q -m "results: trained flagship params snapshot (round 4)" || true

# ---- 2. bench warm + record (cache should be warm; bounded anyway)
if [ "$(left)" -gt 2700 ]; then
  note "bench start"
  timeout 2700 python bench.py > results/evals/r4_bench.json 2>/tmp/bench_err.log
  note "bench rc=$?: $(tail -1 results/evals/r4_bench.json 2>/dev/null)"
  probe 10 || note "tunnel unwell after bench; evals will probe again"
fi

run_eval() { # tag, budget_s, extra args...
  local tag=$1 budget=$2; shift 2
  [ "$(left)" -lt 900 ] && { note "skip $tag (deadline)"; return; }
  # keep 960s clear of END_TS: a SIGTERM'd eval that is blocked in a
  # remote compile only dies at the 900s graceful-stop SIGALRM, so a
  # thinner margin can leak a live JAX process into the driver's own
  # bench run (the tunnel-wedge class that lost BENCH_r03)
  local m=$(( $(left) - 960 ))
  [ "$budget" -gt "$m" ] && budget=$m
  note "eval $tag start (budget ${budget}s)"
  timeout "$budget" python test.py --resume "$SNAP" "$@" > "/tmp/eval_${tag}.log" 2>&1
  note "eval $tag rc=$?"
  local d=$(ls -dt logs/*_eval/2* 2>/dev/null | head -1)
  [ -n "$d" ] && cp "$d/log.txt" "results/evals/${tag}.log" 2>/dev/null
  tail -30 "/tmp/eval_${tag}.log" >> "results/evals/${tag}.log" 2>/dev/null || true
  # per-scene artifacts (errors.npy/flag.npy) for the failure autopsy
  if [ -n "$d" ] && ls "$d"/*/errors.npy >/dev/null 2>&1; then
    mkdir -p "results/evals/${tag}_scenes"
    (cd "$d" && tar cf - */errors.npy */flag.npy */est.log 2>/dev/null) | \
      (cd "results/evals/${tag}_scenes" && tar xf -) || true
  fi
  git add results >/dev/null 2>&1 && git commit -q -m "results: $tag eval artifacts" || true
  probe 8 || note "tunnel unwell after $tag"
}

# Single-bucket override (36864, batch 1): one program for both RR
# evals (protocol-neutral, padding is masked; proven memory-safe).
ONEB="--eval_buckets 36864 --eval_batch 1"
run_eval r4_3DMatch   3300 --benchmark 3DMatch   --config conf/3dmatch_synthx3_cur.yaml $ONEB
run_eval r4_3DLoMatch 1500 --benchmark 3DLoMatch --config conf/3dmatch_synthx3_cur.yaml $ONEB

# ---- 5. banded kNN on the trained model (VERDICT item 3: the round-3
# gate ran at RR 0.14 and was confounded; this is the ship-or-close
# measurement)
run_eval r4_3DMatch_band034 2400 --benchmark 3DMatch --config conf/3dmatch_synthx3_cur.yaml --knn_band 0.34 $ONEB

# ---- 6. RANSAC refinement on the trained model (VERDICT item 5)
run_eval r4_3DLoMatch_ransac 2400 --benchmark 3DLoMatch --config conf/3dmatch_synthx3_cur.yaml --ransac $ONEB

# ---- 6b. banded-kNN pairs/s (item 3's other half: the ship case
# needs the measured win, the close case quotes it in DESIGN §13)
if [ "$(left)" -gt 1500 ]; then
  B=$(( $(left) - 960 )); [ "$B" -gt 2400 ] && B=2400
  note "bench_variants banded_034_L0 (budget ${B}s)"
  timeout "$B" python tools/bench_variants.py --only banded_034_L0 \
    > results/evals/r4_banded_throughput.log 2>&1
  note "banded bench rc=$?"
  git add results >/dev/null 2>&1 && git commit -q -m "results: r4 banded-kNN pairs/s" || true
  probe 8 || note "tunnel unwell after banded bench"
fi

# ---- 7. batch-amortized serving throughput (VERDICT item 4;
# normally already banked by the bootstrap's stage 2b)
if [ ! -s results/evals/r4_batch_throughput.log ] && [ "$(left)" -gt 1200 ]; then
  B=$(( $(left) - 960 )); [ "$B" -gt 3000 ] && B=3000
  note "bench_variants batch2,batch4 (budget ${B}s)"
  timeout "$B" python tools/bench_variants.py --only baseline,batch2,batch4 \
    > results/evals/r4_batch_throughput.log 2>&1
  note "bench_variants rc=$?"
  git add results >/dev/null 2>&1 && git commit -q -m "results: r4 batch-amortized throughput" || true
  probe 8 || note "tunnel unwell after bench_variants"
fi

# ---- 8. rsel variant (VERDICT item 5b; own cold compile)
run_eval r4_3DLoMatch_rsel 2400 --benchmark 3DLoMatch --config conf/3dmatch_synthx3_cur.yaml --ransac_select $ONEB

# ---- 9. decoder-variant smoke (VERDICT item 7, third attempt).
# Skipped if the CPU-side smoke already banked the artifact (round 4
# runs it nice-19 on the host in parallel with training, precisely so
# this lowest-priority TPU slot can go to the RR evals instead).
if [ ! -s results/evals/r4_decoder_smoke.log ] && [ "$(left)" -gt 1500 ]; then
  B=$(( $(left) - 960 )); [ "$B" -gt 2400 ] && B=2400
  note "decoder smoke (budget ${B}s)"
  timeout "$B" python train.py --config conf/modelnet_synth_decoder.yaml \
    --niter 1500 --num_workers 2 --summary_every 200 --validate_every 300 \
    > /tmp/r4_decoder.log 2>&1
  note "decoder smoke rc=$?"
  grep -aE "val|Validation|best" /tmp/r4_decoder.log | tail -12 \
    > results/evals/r4_decoder_smoke.log 2>/dev/null || true
  git add results >/dev/null 2>&1 && git commit -q -m "results: r4 decoder-variant smoke" || true
fi

# machine-readable recap of everything that landed
{
  echo "# Round-4 eval summary ($(date -u +%F\ %T) UTC)"
  echo "model: $SNAP"
  for f in results/evals/r4_*.log results/evals/r4_bench.json; do
    [ -f "$f" ] || continue
    echo; echo "## $f"
    grep -aE "recall|RR by|pairs/s|RMSE|APE|rot err|metric|PARTIAL|sweep|val" "$f" | tail -14
  done
} > results/evals/SUMMARY_r4.md
git add results >/dev/null 2>&1 && \
  git commit -q -m "results: round-4 eval artifacts + summary" || true
touch /tmp/evals_done
note "endgame r4 done ($(left))s left"
