#!/bin/bash
# Round-5 on-chip campaign, part 2: the draw chain (VERDICT r4 #4).
# 1. stage anatomy of the fused draw kernel (where do 14.2 ms go?)
#    + the doubled-tables variant (the "measure it" item) + the product
#    chain under the fast f32 semantics (ZT_DRAW_FAST, new default)
# 2. the product chain under the exact semantics (ZT_DRAW_FAST=0 A/B)
# 3. on-chip parity of the shipped routes with fast draws (mega vs XLA
#    probe -- both sides share the semantics, rel tolerance unchanged)
# 4. bench with the regression gate
set -x
cd /root/repo
mkdir -p runs

echo "=== draw anatomy (fast semantics, + twotab variant) ==="
ZT_DRAW_FAST=1 timeout 3000 python scripts/draw_anatomy.py

echo "=== draw product stage, exact semantics (A/B) ==="
ZT_DRAW_FAST=0 ANAT_STAGES=full,product timeout 1200 python scripts/draw_anatomy.py

echo "=== validate shipped kernels on-chip (fast draws) ==="
VAL_N=512 VAL_1024=0 timeout 2400 python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "=== bench: default route (fast draws) ==="
BENCH_E2E=0 BENCH_REGRESSION_FAIL=1 timeout 2400 python bench.py
echo "BENCH_EXIT=$?"

echo "DRAW_DONE"
