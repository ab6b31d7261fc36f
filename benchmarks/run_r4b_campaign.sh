#!/bin/bash
# Round-4 follow-up measurements: re-run the steps invalidated by fixes
# (cycled: sqrt-lambda inflation application; anatomy: corrected phase
# labels) and the obs-capacity sweep with per-point subprocess isolation
# (a 200k-obs point crashed the TPU worker in the first pass).
cd /root/repo
LOG=/tmp/tpu_r4b.log
step() {
  name=$1; tmo=$2; shift 2
  echo "== $name start $(date -u +%H:%M:%S)" >> $LOG
  timeout "$tmo" "$@" --json "benchmarks/.r4_$name.json" >> $LOG 2>&1
  echo "== $name exit=$? $(date -u +%H:%M:%S)" >> $LOG
}
step cycled2  5400 python benchmarks/cycled_production.py
step anatomy2 5400 python benchmarks/api_anatomy.py
step obscap  21600 python benchmarks/run_benchmarks.py --configs 12
echo "== r4b campaign done $(date -u +%H:%M:%S)" >> $LOG
