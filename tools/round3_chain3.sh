#!/bin/bash
# Round-3 TPU chain, part 3: after chain2 (pid /tmp/chain2.pid) drains,
# measure the feature_un gate step-time delta (VERDICT item 8's "Done")
# at the 16k train config. Kept out of chain2 because that script was
# already running when this was written (bash reads scripts lazily —
# appending to a running script is unsafe).
set -u
cd /root/repo
LOG=/tmp/round3_chain3.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain3 waiting on chain2 pid $(cat /tmp/chain2.pid)"
while kill -0 "$(cat /tmp/chain2.pid)" 2>/dev/null; do sleep 30; done
note "chain2 done; measuring feature_un gate"
timeout 7200 python tools/measure_feature_un_gate.py \
    > /tmp/fun_gate.log 2>&1
note "feature_un gate rc=$?"
note "chain3 done"
