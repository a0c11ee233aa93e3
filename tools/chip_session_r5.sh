#!/bin/bash
# Round-5 chip-window orchestrator. Same marker-resumable discipline as
# tools/chip_session.sh (round 3): each step runs once, under timeout,
# logging to $CHIP_LOG (default /tmp/chip_r5/); a step is skipped only if
# its marker says "ok". Priority order = round-5 verdict order:
#   1. green tpu-check record (Next #3, carried from rounds 2-4)
#   2. filtered bench — the data-varying FilteredExecutor headline (Next #1)
#   3. f64 roofline — the restructured stack-ozaki number (Next #2)
#   4. every BASELINE config re-captured (Next #8: sparse5/mixed stale)
#   5. packed fine-block primitive probe (Next #5)
#   6. ICI model compute anchor (Next #6)
#   7. clustered gap diagnostics + forced-driver sweep (Next #4)
set -u
LOG=${CHIP_LOG:-/tmp/chip_r5}
mkdir -p $LOG
cd /root/repo

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -n "${CHIP_STEP_TIMEOUT_CAP:-}" ] \
     && [ "$to" -gt "$CHIP_STEP_TIMEOUT_CAP" ]; then
    to=$CHIP_STEP_TIMEOUT_CAP
  fi
  if [ "$(cat "$LOG/$name.marker" 2>/dev/null)" = ok ]; then
    echo "== $name: already done (rm $LOG/$name.marker to redo)"; return 0
  fi
  echo "== $name (timeout ${to}s)"
  rm -f "$LOG/$name.marker"
  if timeout "$to" "$@" > "$LOG/$name.log" 2>&1; then
    echo ok > "$LOG/$name.marker"
  else
    local rc=$?
    [ $rc -eq 124 ] && echo TIMEOUT > "$LOG/$name.marker" \
                    || echo "rc=$rc" > "$LOG/$name.marker"
    echo "   $name FAILED (rc=$rc) — tail:"
    tail -5 "$LOG/$name.log"
  fi
}

if [ "${CHIP_PROBE_SKIP:-0}" = 1 ]; then
  echo "probe SKIPPED (CHIP_PROBE_SKIP=1 — rehearsal mode)"
elif timeout 400 python tools/chip_probe.py > "$LOG/probe.log" 2>&1; rc=$?; [ $rc -ne 0 ]; then
  : # rc captured BEFORE the negation (plain $? inside the branch is the
    # negated condition status, which reported the round-7 probe failure
    # as "rc=0")
  if [ $rc -eq 124 ] || [ $rc -eq 143 ]; then
    echo "chip DOWN (probe timed out) — aborting"; exit 1
  fi
  echo "probe FAILED rc=$rc (NOT a timeout — inspect $LOG/probe.log):"
  tail -5 "$LOG/probe.log"; exit 2
fi
echo "chip UP"

# 1. kernel parity gate, then the full curated battery (the 3-round-old
#    green-record item). 5400s: the 2026-08-19 run measured 39:43.
step validate 1800 python -c "import dbcsr_tpu as dt; dt.init_lib(); assert dt.testing.validate_kernels(), 'kernel validation failed'"
step tpu_check 5400 make tpu-check

# 2. the round-5 headline: data-varying filtered bench
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_filtered 1800 python bench.py filtered

# 3. f64 throughput: restructured stack-ozaki roofline entries
step f64_roofline 2400 python tools/f64_roofline.py

# 4. every BASELINE config gets a current-round chip number
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_block23 900 python bench.py
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_banded 900 python bench.py banded
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_sparse5 900 python bench.py sparse5
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_mixed 1200 python bench.py mixed
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_clustered 1200 python bench.py clustered
DBCSR_BENCH_PROBE_TIMEOUT=400 step bench_tensor 1800 python bench.py tensor

# 5. packed fine-block primitive rates (adopt-or-retire decision data)
step packed_probe 1800 python tools/packed_probe.py

# 6. ICI weak-scaling model: measure the compute term on the chip
step ici_anchor 1800 python tools/ici_model.py 64 0.25 f32 --anchor
step ici_anchor256 1800 python tools/ici_model.py 256 0.25 f32 --anchor

# 7. clustered gap: pattern stats + forced-driver sweep
step clustered_diag 2400 python tools/clustered_diag.py --sweep

echo "== all steps attempted; markers:"
bad=0
for m in "$LOG"/*.marker; do
  s=$(cat "$m")
  echo "  $(basename "$m" .marker): $s"
  [ "$s" = ok ] || bad=1
done
exit $bad
