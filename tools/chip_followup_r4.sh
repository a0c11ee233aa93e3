#!/bin/bash
# Round-4 follow-up chip steps: the 2026-08-18 window left exactly these
# gaps (docs/measured/window_20260818T1646.md "Not captured"): the
# clustered reorder bench, filtered/tensor recaptures against their
# now-pinned refs, the ozaki entries the f64 roofline tool grew after
# the window ran, and a fresh headline capture. Same marker discipline
# as tools/chip_session.sh; waits for an optional PID (the running
# battery) to exit first so the one-chip-process-at-a-time rule holds.
#
# Usage: bash tools/chip_followup_r4.sh [wait_pid]
set -u
LOG=${CHIP_LOG:-/tmp/chip_r4b}
mkdir -p "$LOG"
cd /root/repo

if [ -n "${1:-}" ]; then
  echo "waiting for pid $1 (battery) to exit..."
  while kill -0 "$1" 2>/dev/null; do sleep 15; done
fi

step() {
  local name=$1 to=$2; shift 2
  if [ "$(cat "$LOG/$name.marker" 2>/dev/null)" = ok ]; then
    echo "== $name: already done"; return 0
  fi
  echo "== $name (timeout ${to}s)"
  rm -f "$LOG/$name.marker"
  if timeout "$to" "$@" > "$LOG/$name.log" 2>&1; then
    echo ok > "$LOG/$name.marker"
  else
    local rc=$?
    [ $rc -eq 124 ] && echo TIMEOUT > "$LOG/$name.marker" \
                    || echo "rc=$rc" > "$LOG/$name.marker"
    echo "   $name FAILED (rc=$rc) — tail:"; tail -5 "$LOG/$name.log"
  fi
}

step bench_clustered 1500 python bench.py clustered
step f64_roofline 2400 python tools/f64_roofline.py
step bench_filtered 900 python bench.py filtered
step bench_tensor 900 python bench.py tensor
step bench_block23 900 python bench.py

python tools/window_report.py "$LOG" > "$LOG/harvest.log" 2>&1 || true

echo "== markers:"
for m in "$LOG"/*.marker; do echo "  $(basename "$m" .marker): $(cat "$m")"; done
