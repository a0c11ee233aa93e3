#!/bin/bash
# Round-3 chip-window orchestrator: runs the queued on-chip work in
# priority order, one process at a time, each under timeout, logging to
# /tmp/chip_r3/. Safe to re-run; steps that already produced their log
# are skipped (delete the log to redo).
set -u
LOG=/tmp/chip_r3
mkdir -p $LOG
cd /root/repo

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  if [ -s "$LOG/$name.log" ] && ! grep -q TIMEOUT "$LOG/$name.marker" 2>/dev/null; then
    echo "== $name: already done (rm $LOG/$name.log to redo)"; return 0
  fi
  echo "== $name (timeout ${to}s)"
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

# 0. probe (fast fail if the tunnel is down)
if ! timeout 90 python /tmp/chip_probe.py > "$LOG/probe.log" 2>&1; then
  echo "chip DOWN — aborting"; exit 1
fi
echo "chip UP"

# 1. panel knob sweep on the bench banded workload (the 1.3 TFLOP/s bar)
step panel_probe 3000 python tools/panel_probe.py

# 2. f64 emulation roofline (ARCHITECTURE entry)
step f64_roofline 1800 python tools/f64_roofline.py

# 3. bench captures (banded + clustered + headline)
step bench_banded 900 python bench.py banded
step bench_clustered 1200 python bench.py clustered
step bench_block23 900 python bench.py

# 4. targeted re-tune of the banded classes (panel/stack/band grids),
#    merged into the device table
step autotune 5400 python -m dbcsr_tpu.autotune \
  --workloads banded_fine banded_fine_large --drivers panel stack band \
  --merge

# 5. re-capture bench after the tuned table update
step bench_banded2 900 python bench.py banded

# 6. curated on-chip battery
step tpu_check 3000 make tpu-check

# 7. checksum refs for the four new perf recipes
for f in square_dense rect1_sparse rect2_sparse singleblock; do
  step perf_$f 1200 python -m dbcsr_tpu.perf tests/inputs/$f.perf --emit-checksum
done

echo "== all steps attempted; logs in $LOG"
