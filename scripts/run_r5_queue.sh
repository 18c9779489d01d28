#!/bin/bash
# Round-5 priority chip queue (VERDICT r4 item #1): re-drive the two
# red round-4 validations green and commit the evidence. Serial, each
# item logged + rc recorded in chip_queue_logs/SUMMARY.txt.
set -u
cd "$(dirname "$0")/.."
mkdir -p chip_queue_logs
SUMMARY=chip_queue_logs/SUMMARY.txt
echo "=== r5 priority queue started $(date -u +%FT%TZ) ===" >> "$SUMMARY"

run() {
  local name=$1 tmo=$2; shift 2
  local log="chip_queue_logs/${name}.log"
  echo "[$(date -u +%H:%M:%S)] START $name: $*" | tee -a "$SUMMARY"
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "[$(date -u +%H:%M:%S)] DONE  $name rc=$rc ($(tail -c 200 "$log" | tr '\n' ' '))" | tee -a "$SUMMARY"
  return $rc
}

# 1. learnable-injection fused gradient on real Mosaic (was rc=1 in r4;
#    acceptance redefined cancellation-aware in c721507, never re-run)
run fused_chip       1800 python scripts/drive_fused_chip.py
# 2. production-npix EHT recovery (was ResourceExhausted in r4; eager
#    auto-chunking fix 5198d00 landed after the queue ran)
run recovery_eht128  3600 python bench_recovery.py --eht --npix 128 --operator factored

echo "=== r5 priority queue finished $(date -u +%FT%TZ) ===" >> "$SUMMARY"
