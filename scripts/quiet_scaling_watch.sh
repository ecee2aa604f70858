#!/bin/bash
# Quiet-window scaling watcher (round cadence, VERDICT r5 #5).
# Samples 1-min loadavg every 120 s; when two consecutive samples are
# < 0.40 it launches the SPARK_GRAFT_SCALING=1 bench session and writes
# the one-line JSON artifact (now self-stamping scaling_window) to
# $OUT.  One shot: exits after the first completed session.
set -u
OUT="${1:-/tmp/scaling_r6.json}"
LOG="${OUT%.json}.log"
cd /root/repo
prev_quiet=0
while true; do
  la=$(awk '{print $1}' /proc/loadavg)
  quiet=$(awk -v l="$la" 'BEGIN{print (l<0.40)?1:0}')
  echo "$(date -u +%FT%TZ) loadavg=$la quiet=$quiet" >> "$LOG"
  if [ "$quiet" = 1 ] && [ "$prev_quiet" = 1 ]; then
    echo "$(date -u +%FT%TZ) launching scaling session" >> "$LOG"
    SPARK_GRAFT_SCALING=1 python bench.py > "$OUT" 2>> "$LOG"
    rc=$?  # must be captured before the next $(date) substitution resets $?
    echo "$(date -u +%FT%TZ) done rc=$rc" >> "$LOG"
    exit "$rc"
  fi
  prev_quiet=$quiet
  sleep 120
done
