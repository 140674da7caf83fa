#!/bin/bash
# Round-3 TPU chain, part 4: after chain3 (pid /tmp/chain3.pid) drains,
# smoke-train the dormant CorrespondenceDecoder variant (VERDICT W7 —
# attention-based coordinate decoder, direct_regress_coor: False).
set -u
cd /root/repo
LOG=/tmp/round3_chain4.log
note() { echo "$(date +%H:%M:%S) $*" >> "$LOG"; }

note "chain4 waiting on chain3 pid $(cat /tmp/chain3.pid)"
while kill -0 "$(cat /tmp/chain3.pid)" 2>/dev/null; do sleep 30; done
note "chain3 done; decoder smoke training"
timeout 3600 python train.py --config conf/modelnet_synth_decoder.yaml \
    --num_workers 2 > /tmp/decoder_tpu.log 2>&1
note "decoder smoke rc=$?"
note "chain4 done"
