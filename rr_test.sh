#!/usr/bin/env bash
# Sweep the pose-solver confidence threshold and record registration
# recall per setting (reference rr_test.sh:26-57 semantics).
#
# Usage: ./rr_test.sh CKPT_DIR [BENCHMARK] [CONFIG]
set -u

MODEL=${1:?usage: rr_test.sh CKPT_DIR [BENCHMARK] [CONFIG]}
BENCHMARK=${2:-3DMatch}
CONFIG=${3:-}

LOG_DIR=evaluate_logs
mkdir -p "$LOG_DIR"

for W in 0.5 0.6 0.7 0.75 0.8 0.85 0.9; do
    STAMP=$(date +%y%m%d_%H%M%S)
    OUT="$LOG_DIR/${BENCHMARK}_w${W}_${STAMP}.log"
    echo "=== weight_th=$W -> $OUT"
    ARGS=(--dev --resume "$MODEL" --benchmark "$BENCHMARK" --weight_th "$W")
    if [ -n "$CONFIG" ]; then ARGS+=(--config "$CONFIG"); fi
    python test.py "${ARGS[@]}" 2>&1 | tee "$OUT"
done
