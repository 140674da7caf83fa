#!/bin/bash
# Training hang watchdog (round 4c). The trainer can deadlock right
# after a checkpoint+validation+mirror cluster (all threads futex-wait,
# 0 CPU — recurred at x3_cur step 76k in round 3 and step 21.5k in
# round 4c). The fix is mechanical and was executed by hand both
# times: shield the bootstrap monitor with a placeholder pid, SIGTERM
# the wedged trainer (second TERM exits immediately), probe the
# tunnel, resume from the newest flagship mirror. This script does it
# automatically so an overnight hang costs minutes, not hours.
#
# Usage (detached):
#   WATCHDOG_END_TS=<epoch to stop watching> setsid nohup \
#     bash tools/train_watchdog.sh > /tmp/watchdog.log 2>&1 &
#
# Hang test: the newest train log's last "step N/" line is older than
# STALL_S (default 1500s). Steady-state summaries print every ~40s;
# validation takes <10 min; nothing legitimate takes 25 min AFTER
# steps have started. Before the first step line (cold compile via the
# remote relay) nothing is ever declared hung — compiles can take
# 40+ min and look identical (0 CPU, futex wait) to a real hang.
set -u
cd /root/repo
PID_FILE=${PID_FILE:-/tmp/r4_train.pid}
STALL_S=${STALL_S:-1500}
# active config: the bootstrap writes /tmp/r4_train_cfg at each stage
# launch so a recovery resumes the RIGHT stage's config; env CFG is
# the fallback for hand-driven runs
CFG_FILE=/tmp/r4_train_cfg
CFG=${CFG:-conf/3dmatch_synthx3_cur.yaml}
WATCHDOG_END_TS=${WATCHDOG_END_TS:?set WATCHDOG_END_TS}
note() { echo "$(date +%H:%M:%S) $*"; }

newest_log() { ls -t /tmp/r4_train*.log 2>/dev/null | head -1; }

last_step_age() { # prints seconds since the newest "step N/" line, or -1
  local lg=$1
  local ts
  ts=$(grep -a -oE '^[0-9:]{8} \[I\] fgfusion: step [0-9]+/' "$lg" | tail -1 | cut -d' ' -f1)
  [ -z "$ts" ] && { echo -1; return; }
  local now epoch
  now=$(date +%s)
  epoch=$(date -d "$(date +%F) $ts" +%s)
  # log timestamps have no date; handle midnight wrap
  [ "$epoch" -gt "$now" ] && epoch=$(( epoch - 86400 ))
  echo $(( now - epoch ))
}

pick_snap() {
  python - <<'PYEOF'
import numpy as np, glob
best, key = "", (-1, 0)
for f in glob.glob('results/snapshots/finegrained_reg_3dmatch_synth*.npz'):
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

note "watchdog up: pid file $PID_FILE, stall ${STALL_S}s, end $WATCHDOG_END_TS"
while [ "$(date +%s)" -lt $(( WATCHDOG_END_TS - 1200 )) ]; do
  sleep 120
  TP=$(cat "$PID_FILE" 2>/dev/null) || continue
  kill -0 "$TP" 2>/dev/null || continue   # dead = bootstrap's business
  # graceful stop in progress? never interfere
  [ -f /tmp/fgfusion_stop ] && continue
  LG=$(newest_log); [ -z "$LG" ] && continue
  AGE=$(last_step_age "$LG")
  if [ "$AGE" -lt 0 ]; then
    # no step line yet: either a legitimate cold compile (up to ~40
    # min via the relay) or a trainer wedged in backend init. Use the
    # log file's mtime with a much larger bound.
    MAGE=$(( $(date +%s) - $(stat -c %Y "$LG") ))
    [ "$MAGE" -lt 4500 ] && continue
    note "no step line and log silent ${MAGE}s — treating as init hang"
  elif [ "$AGE" -lt "$STALL_S" ]; then
    continue   # healthy
  fi
  # confirm 0 CPU over 30s (a busy trainer is never hung)
  u1=$(awk '{print $14+$15}' "/proc/$TP/stat" 2>/dev/null) || continue
  sleep 30
  u2=$(awk '{print $14+$15}' "/proc/$TP/stat" 2>/dev/null) || continue
  [ $(( u2 - u1 )) -gt 5 ] && { note "stale log but CPU active; not hung"; continue; }
  note "HANG: last step line ${AGE}s ago, 0 CPU. Recovering pid $TP"
  # 1. shield the bootstrap monitor (short-lived placeholder: if this
  # script dies mid-recovery the chain unblocks by itself)
  setsid sleep 1200 < /dev/null > /dev/null 2>&1 &
  echo $! > "$PID_FILE"
  # 1b. capture all-thread Python stacks for the root-cause dig —
  # ONLY if this trainer registered the handler (an unregistered
  # SIGUSR1 would terminate it without the stack dump)
  if grep -aq "faulthandler: SIGUSR1 registered" "$LG"; then
    note "dumping thread stacks (SIGUSR1)"
    kill -USR1 "$TP" 2>/dev/null; sleep 5
    tail -150 "$LG" > "/tmp/hang_stacks_$(date +%H%M).log" 2>/dev/null
  fi
  # 2. kill the wedged trainer (TERM, TERM, KILL)
  kill -TERM "$TP" 2>/dev/null; sleep 45
  kill -0 "$TP" 2>/dev/null && { kill -TERM "$TP" 2>/dev/null; sleep 30; }
  kill -0 "$TP" 2>/dev/null && { kill -9 "$TP" 2>/dev/null; sleep 10; }
  if kill -0 "$TP" 2>/dev/null; then note "unkillable; giving up this round"; exit 1; fi
  # 3. tunnel probe (hard-timeout subprocess probes)
  ok=""
  for i in $(seq 12); do
    if timeout 240 python tools/tpu_probe.py 2>/dev/null | grep -q "TPU OK"; then
      ok=1; note "TPU OK (try $i)"; break
    fi
    note "tunnel not answering (try $i)"; sleep 45
  done
  [ -z "$ok" ] && { note "tunnel never recovered; leaving placeholder"; exit 1; }
  # 4. resume from the newest flagship mirror
  SNAP=$(pick_snap)
  [ -z "$SNAP" ] && { note "no snapshot!"; exit 1; }
  [ -s "$CFG_FILE" ] && CFG=$(cat "$CFG_FILE")
  note "resuming $CFG from $SNAP"
  (setsid nohup python train.py --config "$CFG" --resume "$SNAP" \
      --niter 200000 --num_workers 2 --summary_every 200 \
      --validate_every 1000 > "/tmp/r4_train_wd$(date +%H%M).log" 2>&1 & \
   echo $! > "$PID_FILE")
  note "relaunched pid $(cat "$PID_FILE")"
  sleep 600   # settle before watching again
done
note "watchdog end"
