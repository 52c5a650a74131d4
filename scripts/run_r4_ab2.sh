#!/bin/bash
# Round-4 follow-up on-chip runs: the new default route (mega on),
# the PLT step A/B (fused coefficient-field kernel vs XLA pack+gather),
# and a clean re-run of the mega parity probe (the first run hit a
# mid-run source edit).  Sequential: one v5e chip.
set -x
cd /root/repo
mkdir -p runs

echo "=== bench E: new default route (mega on) ==="
BENCH_E2E=0 timeout 2400 python bench.py

echo "=== bench F: PLT fused route ==="
BENCH_PLT=1 BENCH_E2E=0 timeout 2400 python bench.py

echo "=== bench G: PLT XLA pack route (A/B baseline) ==="
BENCH_PLT=1 ZT_NO_PALLAS_PACK=1 BENCH_E2E=0 timeout 2400 python bench.py

echo "=== mega parity probe (clean rerun) ==="
VAL_N= VAL_1024=0 timeout 2400 python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "AB2_DONE"
