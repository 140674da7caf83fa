#!/bin/bash
# Manually trigger the graceful end-of-training stop ahead of the
# bootstrap's own deadline, so the endgame eval queue gets a bigger
# window (every eval program compiles cold after a reset: ~20-30 min
# each via the remote relay — the default 5400s reserve fits only two
# of the five queued evals). Touches the same STOP files the trainer
# polls; the bootstrap monitor sees the exit and hands off to
# round4_endgame.sh.
set -u
cd /root/repo
D=$(ls -dt logs/*/2* 2>/dev/null | head -1)
[ -n "$D" ] && touch "${D}/STOP" && echo "STOP -> ${D}"
touch /tmp/fgfusion_stop
echo "global stop file set; trainer stops at the next poll (<=900s alarm)"
