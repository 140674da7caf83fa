#!/bin/bash
# Round-5 endgame: post-training TPU eval queue. Differences from
# round4_endgame.sh: A/B-compares the stage-B (cur, [0.10,1.01) band)
# and stage-C (cur05, [0.05,1.01) band) lineages when both exist —
# the VERDICT-W2 experiment. Banded-kNN/batch measurements are NOT
# re-run (settled in round 4; see results/evals/r4_* and DESIGN §13).
set -u
cd /root/repo
LOG=/tmp/round5_endgame.log
END_TS=${END_TS:-$(( $(date +%s) + 7200 ))}
CAP=${CAP_TS:-$END_TS}
[ "$END_TS" -gt "$CAP" ] && END_TS=$CAP
if [ -s /tmp/r5_cap_ts ]; then
  FCAP=$(cat /tmp/r5_cap_ts)
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

note "r5 queue: waiting for training chain (pid $(cat /tmp/chain.pid))"
while kill -0 "$(cat /tmp/chain.pid)" 2>/dev/null; do sleep 60; done
sleep 30; probe 30 || exit 1

pick() { # lineage glob -> highest-step snapshot (best before latest)
  python - "$1" <<'PYEOF'
import numpy as np, glob, sys
best, key = "", (-1, 0)
for f in glob.glob(sys.argv[1]):
    kind = 1 if f.endswith('_best.npz') else 0
    try:
        step = int(np.load(f, allow_pickle=True)['__step__'])
    except Exception:
        continue
    if (step, kind) > key:
        key, best = (step, kind), f
print(best)
PYEOF
}
SNAP_CUR=$(pick 'results/snapshots/finegrained_reg_3dmatch_synthx3_cur_*.npz')
[ -z "$SNAP_CUR" ] && SNAP_CUR=$(pick 'results/snapshots/finegrained_reg_3dmatch_synth*.npz')
SNAP_C05=$(pick 'results/snapshots/finegrained_reg_3dmatch_synthx3_cur05_*.npz')
[ -z "$SNAP_CUR" ] && { note "no snapshot found"; exit 1; }
note "cur: $SNAP_CUR | cur05: ${SNAP_C05:-none} ($(left)s left)"
mkdir -p results/evals
git add results/snapshots >/dev/null 2>&1 && \
  git commit -q -m "results: trained flagship params snapshots (round 5)" || true

if [ "$(left)" -gt 2700 ]; then
  note "bench start"
  timeout 2700 python bench.py > results/evals/r5_bench.json 2>/tmp/bench_err.log
  note "bench rc=$?: $(tail -1 results/evals/r5_bench.json 2>/dev/null)"
  probe 10 || note "tunnel unwell after bench"
fi

run_eval() { # tag, budget_s, snap, extra args...
  local tag=$1 budget=$2 snap=$3; shift 3
  [ -z "$snap" ] && { note "skip $tag (no snapshot)"; return; }
  [ "$(left)" -lt 900 ] && { note "skip $tag (deadline)"; return; }
  local m=$(( $(left) - 960 ))
  [ "$budget" -gt "$m" ] && budget=$m
  note "eval $tag start (budget ${budget}s, $snap)"
  timeout "$budget" python test.py --resume "$snap" "$@" > "/tmp/eval_${tag}.log" 2>&1
  note "eval $tag rc=$?"
  local d=$(ls -dt logs/*_eval/2* 2>/dev/null | head -1)
  [ -n "$d" ] && cp "$d/log.txt" "results/evals/${tag}.log" 2>/dev/null
  tail -30 "/tmp/eval_${tag}.log" >> "results/evals/${tag}.log" 2>/dev/null || true
  if [ -n "$d" ] && ls "$d"/*/errors.npy >/dev/null 2>&1; then
    mkdir -p "results/evals/${tag}_scenes"
    (cd "$d" && tar cf - */errors.npy */flag.npy */est.log 2>/dev/null) | \
      (cd "results/evals/${tag}_scenes" && tar xf -) || true
  fi
  git add results >/dev/null 2>&1 && git commit -q -m "results: $tag eval artifacts" || true
  probe 8 || note "tunnel unwell after $tag"
}

ONEB="--eval_buckets 36864 --eval_batch 1"
CFG=conf/3dmatch_synthx3_cur.yaml
# 1-2: headline RR on the proven cur lineage
run_eval r5_3DMatch   3300 "$SNAP_CUR" --benchmark 3DMatch   --config $CFG $ONEB
run_eval r5_3DLoMatch 1500 "$SNAP_CUR" --benchmark 3DLoMatch --config $CFG $ONEB
# 3-4: the cur05 A/B (same program — no extra compile)
run_eval r5_3DLoMatch_cur05 1500 "$SNAP_C05" --benchmark 3DLoMatch --config $CFG $ONEB
run_eval r5_3DMatch_cur05   1500 "$SNAP_C05" --benchmark 3DMatch   --config $CFG $ONEB
# 5: low-overlap serving recipe on the stronger lineage (RANSAC)
run_eval r5_3DLoMatch_ransac 2400 "$SNAP_CUR" --benchmark 3DLoMatch --config $CFG --ransac $ONEB

{
  echo "# Round-5 eval summary ($(date -u +%F\ %T) UTC)"
  echo "cur: $SNAP_CUR"
  echo "cur05: ${SNAP_C05:-none}"
  for f in results/evals/r5_*.log results/evals/r5_bench.json; do
    [ -f "$f" ] || continue
    echo; echo "## $f"
    grep -aE "recall|RR by|pairs/s|RMSE|APE|rot err|metric|PARTIAL|sweep|val" "$f" | tail -14
  done
} > results/evals/SUMMARY_r5.md
git add results >/dev/null 2>&1 && \
  git commit -q -m "results: round-5 eval artifacts + summary" || true
touch /tmp/evals_done
note "endgame r5 done ($(left)s left)"
