#!/bin/bash
# Round-4 TPU measurement campaign. Sequential; each step bounded and
# written to its own file so partial progress survives interruption.
cd /root/repo
LOG=/tmp/tpu_r4.log
step() {
  name=$1; shift
  if [ -f "benchmarks/.r4_$name.json" ]; then
    echo "== skip $name (exists)" >> $LOG; return
  fi
  echo "== $name start $(date -u +%H:%M:%S)" >> $LOG
  timeout 5400 "$@" --json "benchmarks/.r4_$name.json" >> $LOG 2>&1
  echo "== $name exit=$? $(date -u +%H:%M:%S)" >> $LOG
}
step core    python benchmarks/run_benchmarks.py --configs 0 2 5 1
step anatomy python benchmarks/api_anatomy.py
step letkf_host  python benchmarks/run_benchmarks.py --configs 7 --letkf-topk host
step letkf_exact python benchmarks/run_benchmarks.py --configs 7
step obscap  python benchmarks/run_benchmarks.py --configs 12
step cycled  python benchmarks/cycled_production.py
step rest    python benchmarks/run_benchmarks.py --configs 3 4 6 8 9 11
echo "== campaign done $(date -u +%H:%M:%S)" >> $LOG
