#!/bin/bash
# Chip-window watcher: probe the axon tunnel on an interval and launch
# the resumable orchestrator (tools/chip_session.sh) the moment a probe
# succeeds. Exits after one orchestrator run (inspect /tmp/chip_r3/ and
# re-run for retries). Honors the one-chip-process-at-a-time rule: the
# watcher's probe IS the only chip user until the orchestrator starts,
# and the orchestrator serializes its own steps.
#
# Usage: bash tools/chip_watch.sh [interval_s] [max_hours]
set -u
INTERVAL=${1:-240}
MAX_HOURS=${2:-12}
LOG=/tmp/chip_r3
mkdir -p "$LOG"
cd /root/repo
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

echo "chip_watch: probing every ${INTERVAL}s for up to ${MAX_HOURS}h"
n=0
while [ "$(date +%s)" -lt "$deadline" ]; do
  n=$((n + 1))
  if timeout 90 python tools/chip_probe.py > "$LOG/watch_probe.log" 2>&1; then
    echo "chip_watch: probe $n OK at $(date -u +%FT%TZ) — launching chip_session"
    set -o pipefail
    if bash tools/chip_session.sh 2>&1 | tee "$LOG/session_run.log"; then
      echo "chip_watch: orchestrator COMPLETE (all markers ok) at $(date -u +%FT%TZ)"
      exit 0
    fi
    rc=$?
    echo "chip_watch: orchestrator INCOMPLETE (rc=$rc) at $(date -u +%FT%TZ) — see $LOG"
    exit 3
  fi
  echo "chip_watch: probe $n down at $(date -u +%FT%TZ)"
  sleep "$INTERVAL"
done
echo "chip_watch: deadline reached without a chip window"
exit 1
