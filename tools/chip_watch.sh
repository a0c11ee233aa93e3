#!/bin/bash
# Chip-window watcher: probe the axon tunnel on an interval and launch
# the resumable orchestrator (tools/chip_session.sh) the moment a probe
# succeeds. The orchestrator is marker-resumable, so an INCOMPLETE run
# (e.g. the tunnel dropped mid-window) sends the watcher back to probing
# and a later window retries only the steps that are not yet ok — up to
# MAX_ATTEMPTS orchestrator launches (a deterministically failing step
# re-runs once per attempt, so the cap bounds wasted chip time). Honors
# the one-chip-process-at-a-time rule: the watcher's probe IS the only
# chip user until the orchestrator starts, and the orchestrator
# serializes its own steps.
#
# Usage: bash tools/chip_watch.sh [interval_s] [max_hours] [max_attempts]
set -u
INTERVAL=${1:-240}
MAX_HOURS=${2:-12}
MAX_ATTEMPTS=${3:-5}
# CHIP_SESSION / CHIP_LOG select the round's orchestrator (round 5:
# tools/chip_session_r5.sh with /tmp/chip_r5)
SESSION=${CHIP_SESSION:-tools/chip_session.sh}
LOG=${CHIP_LOG:-/tmp/chip_r3}
export CHIP_LOG="$LOG"
mkdir -p "$LOG"
cd /root/repo
deadline=$(( $(date +%s) + MAX_HOURS * 3600 ))

harvest() {
  # move window results into the repo tree the moment the orchestrator
  # stops: /tmp does not survive the round, and the round driver commits
  # any uncommitted work — so even an unattended window ends up recorded.
  # Both tools are idempotent and safe on partial windows.
  python tools/apply_checksums.py "$LOG" >> "$LOG/harvest.log" 2>&1 || true
  python tools/window_report.py "$LOG" >> "$LOG/harvest.log" 2>&1 || true
}

echo "chip_watch: probing every ${INTERVAL}s for up to ${MAX_HOURS}h"
n=0
attempts=0
while [ "$(date +%s)" -lt "$deadline" ]; do
  n=$((n + 1))
  if timeout 400 python tools/chip_probe.py > "$LOG/watch_probe.log" 2>&1; then
    attempts=$((attempts + 1))
    echo "chip_watch: probe $n OK at $(date -u +%FT%TZ) — launching chip_session (attempt $attempts/$MAX_ATTEMPTS)"
    if bash "$SESSION" > "$LOG/session_run_$attempts.log" 2>&1; then
      echo "chip_watch: orchestrator COMPLETE (all markers ok) at $(date -u +%FT%TZ)"
      harvest
      exit 0
    fi
    echo "chip_watch: orchestrator INCOMPLETE (attempt $attempts) at $(date -u +%FT%TZ) — see $LOG"
    harvest   # partial results are still results — move them into the repo
    if [ "$attempts" -ge "$MAX_ATTEMPTS" ]; then
      echo "chip_watch: attempt budget exhausted — manual inspection needed"
      exit 3
    fi
  else
    echo "chip_watch: probe $n down at $(date -u +%FT%TZ)"
  fi
  sleep "$INTERVAL"
done
echo "chip_watch: deadline reached without a chip window"
exit 1
