#!/bin/bash
# Sequential ZT_FFT_PRECISION ladder on the real TPU (one client at a time).
# Usage: setsid nohup bash scripts/run_ladder.sh > runs/ladder.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
mkdir -p runs
for prec in highest high default; do
  ZT_FFT_PRECISION=$prec python scripts/measure_precision.py 2>&1 | tail -2
done
for prec in highest high; do
  echo "=== bench 512 ZT_FFT_PRECISION=$prec ==="
  ZT_FFT_PRECISION=$prec BENCH_PPD=512 timeout 3600 python bench.py
done
echo LADDER_DONE
