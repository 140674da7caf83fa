#!/bin/bash
# Round-4 bootstrap: ONE entrypoint for the start of the next round
# (or after any VM reset). Encodes the full recovery sequence that
# rounds 3b-3f re-derived by hand each time, so round-4 wall clock
# converts into training instead of plumbing.
#
# Usage (detached, from /root/repo):
#   ROUND_END_TS=$(date -d '+8 hours' +%s) \
#     (setsid nohup bash tools/round4_bootstrap.sh > /tmp/r4.log 2>&1 &)
#
# Sequence (ONE TPU process at a time — CLAUDE.md discipline):
#   0. durability watcher + dataset regen start (CPU, in parallel)
#   1. TPU probe (gate everything on "TPU OK")
#   2. bench.py once — re-warms the driver-critical program cache
#      FIRST (a cut-short round must still leave bench warm)
#   3. training: warm-start the best surviving snapshot on the
#      git-tracked synthxl data (x3 capacities = shared compiled
#      program), switch to the x3 low-overlap curriculum when the
#      960-scene regen lands; graceful STOP-file stop at the endgame
#      margin (never kill — tunnel-wedge risk, STATUS.md incidents)
#   4. round3e_endgame.sh: RR evals + MCD + artifact commits
set -u
cd /root/repo
LOG=/tmp/round4_bootstrap.log
note() { echo "$(date +%H:%M:%S) $*" | tee -a "$LOG"; }

ROUND_END_TS=${ROUND_END_TS:-$(( $(date +%s) + 8 * 3600 ))}
ENDGAME_S=${ENDGAME_S:-5400}   # reserve for evals (incl. their compiles)
left() { echo $(( ROUND_END_TS - $(date +%s) )); }
note "bootstrap: $(left)s to round end, ${ENDGAME_S}s endgame reserve"

# ---- 0. watcher + regen (CPU; niced so the train host loop wins) ----
if ! { [ -f /tmp/committer.pid ] && kill -0 "$(cat /tmp/committer.pid)" 2>/dev/null; }; then
  (setsid nohup bash tools/snapshot_committer.sh > /dev/null 2>&1 & \
   echo $! > /tmp/committer.pid)
fi
rm -f /tmp/x3_ready /tmp/modelnet_ready /tmp/mcd_ready
if [ ! -f datasets/3dmatch_synthx3/data/train_cur_pairs-overlapmask.h5 ]; then
  (setsid nohup nice -n 15 bash tools/round3c_regen.sh > /dev/null 2>&1 & \
   echo $! > /tmp/regen.pid)
  note "dataset regen launched (pid $(cat /tmp/regen.pid))"
else
  touch /tmp/x3_ready; note "x3 data already present"
fi

# ---- 1. TPU probe ----
ok=""
for i in $(seq 40); do
  if timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK"; then
    ok=1; note "TPU OK (try $i)"; break
  fi
  note "TPU not answering (try $i)"; sleep 60
done
[ -z "$ok" ] && { note "TPU never answered; aborting"; exit 1; }

# ---- 2. bench warm (driver-critical program) ----
if [ "$(left)" -gt $(( ENDGAME_S + 2400 )) ]; then
  note "bench warm start"
  timeout 2700 python bench.py > /tmp/r4_bench.json 2>/tmp/r4_bench_err.log
  note "bench rc=$?: $(tail -1 /tmp/r4_bench.json 2>/dev/null)"
else
  note "skip bench warm (deadline)"
fi

# ---- 3. training ----
SNAP=""
for f in results/snapshots/finegrained_reg_3dmatch_synthx3_cur_latest.npz \
         results/snapshots/finegrained_reg_3dmatch_synthx3_cur_best.npz \
         results/snapshots/finegrained_reg_3dmatch_synthxl_w_latest.npz; do
  [ -f "$f" ] && { SNAP="$f"; break; }
done
TRAIN_S=$(( $(left) - ENDGAME_S ))
if [ -n "$SNAP" ] && [ "$TRAIN_S" -gt 2400 ]; then
  if [ -f /tmp/x3_ready ]; then
    CFG=conf/3dmatch_synthx3_cur.yaml
  else
    # synthxl data w/ x3 capacities — same compiled program as x3_cur,
    # so the mid-run config switch reuses the cache
    CFG=conf/3dmatch_synthxl_warm.yaml
  fi
  note "stage A: $CFG warm-start from $SNAP, budget ${TRAIN_S}s"
  RUN_TAG=$(date +%y%m%d_%H%M%S)
  (setsid nohup python train.py --config "$CFG" --resume "$SNAP" \
      --niter 200000 --num_workers 2 --summary_every 200 \
      --validate_every 1000 > /tmp/r4_trainA.log 2>&1 & echo $! > /tmp/r4_train.pid)
  # wait for x3 data (if stage A is on synthxl) or the train deadline
  TRAIN_DEADLINE=$(( $(date +%s) + TRAIN_S ))
  while [ "$(date +%s)" -lt "$TRAIN_DEADLINE" ]; do
    kill -0 "$(cat /tmp/r4_train.pid)" 2>/dev/null || { note "train exited"; break; }
    if [ "$CFG" != conf/3dmatch_synthx3_cur.yaml ] && [ -f /tmp/x3_ready ]; then
      note "x3 ready: graceful-stopping stage A to switch configs"
      D=$(ls -dt logs/*/2* 2>/dev/null | head -1)
      [ -n "$D" ] && touch "${D}/STOP"; touch /tmp/fgfusion_stop
      for i in $(seq 60); do
        kill -0 "$(cat /tmp/r4_train.pid)" 2>/dev/null || break; sleep 20
      done
      rm -f /tmp/fgfusion_stop
      # resume stage B from stage A's own latest mirror (falls back to $SNAP)
      SNAP2=$(ls -t results/snapshots/*latest.npz 2>/dev/null | head -1)
      CFG=conf/3dmatch_synthx3_cur.yaml
      note "stage B: $CFG from ${SNAP2:-$SNAP}"
      (setsid nohup python train.py --config "$CFG" --resume "${SNAP2:-$SNAP}" \
          --niter 200000 --num_workers 2 --summary_every 200 \
          --validate_every 1000 > /tmp/r4_trainB.log 2>&1 & echo $! > /tmp/r4_train.pid)
    fi
    sleep 60
  done
  if kill -0 "$(cat /tmp/r4_train.pid)" 2>/dev/null; then
    note "train deadline: graceful stop"
    D=$(ls -dt logs/*/2* 2>/dev/null | head -1)
    [ -n "$D" ] && touch "${D}/STOP"; touch /tmp/fgfusion_stop
    for i in $(seq 90); do
      kill -0 "$(cat /tmp/r4_train.pid)" 2>/dev/null || break; sleep 20
    done
    rm -f /tmp/fgfusion_stop
  fi
else
  note "skip training (no snapshot or <2400s budget)"
fi

# ---- 4. endgame evals ----
# round3e_endgame waits for the pid in /tmp/chain.pid to die before it
# starts; training is already stopped here, so hand it a dead pid.
echo 99999999 > /tmp/chain.pid
END_TS=$(( ROUND_END_TS - 120 )) bash tools/round3e_endgame.sh
note "bootstrap done"
