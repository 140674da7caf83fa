#!/bin/bash
# Round-4 decoder-variant smoke on the HOST CPU (VERDICT item 7, 4th
# attempt — the previous three were lost to VM resets). Runs nice-19
# in parallel with TPU training (FGFUSION_PLATFORM=cpu keeps it off
# the axon tunnel entirely). Waits for the modelnet regen, trains the
# CorrespondenceDecoder config, and banks the val artifact to
# results/evals/r4_decoder_smoke.log + git — including a PARTIAL
# artifact if the wall clock closes first, so the endgame's TPU slot
# stays free for the RR evals either way.
#   DEADLINE_TS=<epoch> bash tools/r4_decoder_cpu.sh
set -u
cd /root/repo
LOG=/tmp/r4_decoder_watch.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }
DEADLINE_TS=${DEADLINE_TS:-$(( $(date +%s) + 6 * 3600 ))}

# wait for the modelnet regen (x3 regenerates first; ~1-2h worst case)
while [ ! -f /tmp/modelnet_ready ] && [ "$(date +%s)" -lt "$DEADLINE_TS" ]; do
  sleep 120
done
[ -f /tmp/modelnet_ready ] || { note "modelnet never regenerated; giving up"; exit 1; }
note "modelnet ready; decoder smoke start"

BUDGET=$(( DEADLINE_TS - $(date +%s) ))
[ "$BUDGET" -lt 900 ] && { note "window too small (${BUDGET}s)"; exit 1; }
# SIGTERM → Trainer GracefulStop: final val + save, so a timeout still
# leaves val lines to salvage.
FGFUSION_PLATFORM=cpu timeout "$BUDGET" nice -n 19 python train.py \
  --config conf/modelnet_synth_decoder.yaml \
  --niter 1500 --num_workers 1 --summary_every 200 --validate_every 300 \
  > /tmp/r4_decoder.log 2>&1
RC=$?
note "decoder smoke rc=$RC"
{
  [ "$RC" -ne 0 ] && echo "PARTIAL (rc=$RC, budget ${BUDGET}s)"
  grep -aE "val|Validation|best" /tmp/r4_decoder.log | tail -15
} > results/evals/r4_decoder_smoke.log
git add results/evals/r4_decoder_smoke.log >/dev/null 2>&1 && \
  git commit -q -m "results: r4 decoder-variant CPU smoke" || true
note "artifact banked"
