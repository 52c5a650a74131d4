#!/bin/bash
# Round-4 on-chip A/B campaign: route-attributed bench numbers for the
# folded-Pallas, pure-XLA, and mega routes (same chip, same timing
# method), followed by the kernel validation probes.  Sequential: the
# env has ONE v5e chip.
set -x
cd /root/repo
mkdir -p runs

echo "=== bench A: pallas default route ==="
BENCH_E2E=0 timeout 2400 python bench.py

echo "=== bench B: pure-XLA route ==="
ZT_NO_PALLAS_FFT=1 ZT_NO_PALLAS=1 BENCH_E2E=0 timeout 2400 python bench.py

echo "=== bench C: mega route ==="
ZT_PALLAS_MEGA=1 BENCH_E2E=0 timeout 2400 python bench.py

echo "=== bench D: pallas route, high precision ==="
ZT_FFT_PRECISION=high BENCH_E2E=0 timeout 2400 python bench.py

echo "=== validate kernels on-chip (1024-class probes) ==="
timeout 2400 python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "AB_DONE"
