#!/bin/bash
# Durability watcher: commit results/ snapshots + eval artifacts AND
# the XLA compile caches (.jax_cache, .jax_cache_cpu — git-tracked
# since round 4d) to git every few minutes so a VM reset can never
# again lose a trained model or cost 25-45 min of relay recompiles.
# Uses `git commit -- <paths>` so it never touches the session's staged
# index for other files. Safe to run detached for the whole session.
set -u
cd /root/repo
LOG=/tmp/snapshot_committer.log
INTERVAL=${INTERVAL:-300}
PATHS="results/ .jax_cache .jax_cache_cpu"
echo "$(date +%H:%M:%S) committer start (interval ${INTERVAL}s)" >> "$LOG"
while true; do
  if [ -n "$(git status --porcelain $PATHS 2>/dev/null)" ]; then
    git add $PATHS >/dev/null 2>&1
    if git commit -q -m "results: auto-commit run artifacts (durability watcher)" -- $PATHS 2>>"$LOG"; then
      echo "$(date +%H:%M:%S) committed: $(git log --oneline -1)" >> "$LOG"
    fi
  fi
  sleep "$INTERVAL"
done
