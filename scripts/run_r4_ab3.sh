#!/bin/bash
# Round-4 PLT A/B at 256^3 (512^3 PLT graphs exceed the remote
# compiler's practical window on this tunnel -- both routes timed out
# at 1500 s; the 256^3 A/B measures the same route difference) and a
# dress-rehearsal default bench exactly as the driver runs it.
set -x
cd /root/repo
mkdir -p runs

echo "=== bench H: PLT fused route, 256^3 ==="
BENCH_PPD=256 BENCH_PLT=1 BENCH_E2E=0 BENCH_TIMEOUT=2200 \
  timeout 2400 python bench.py

echo "=== bench I: PLT XLA pack route, 256^3 (A/B baseline) ==="
BENCH_PPD=256 BENCH_PLT=1 ZT_NO_PALLAS_PACK=1 BENCH_E2E=0 \
  BENCH_TIMEOUT=2200 timeout 2400 python bench.py

echo "=== bench J: driver dress rehearsal (defaults, incl. e2e) ==="
timeout 2400 python bench.py

echo "AB3_DONE"
