#!/bin/bash
# Round-5 on-chip campaign, part 1: un-regress the x-pass (VERDICT r4 #1).
#
# A/B the two orientations of the folded x-pass on the real chip --
#   transpose: VMEM transpose + sublane contraction (_folded_axis0), the
#              pre-2e64281 form, restored as default
#   lane:      direct lane contraction (_folded_axis1), the r4 regression
# -- then validate the shipped kernels on-chip (incl. the new n=128
# zx_folded probe, advisor r4) and record the default-route bench.
# Sequential: the env has ONE v5e chip.
set -x
cd /root/repo
mkdir -p runs

echo "=== profile A: ZT_ZX_XPASS=transpose (default) ==="
ZT_ZX_XPASS=transpose timeout 2400 python scripts/profile_step.py

echo "=== profile B: ZT_ZX_XPASS=lane (r4 regression form) ==="
ZT_ZX_XPASS=lane timeout 2400 python scripts/profile_step.py

echo "=== validate kernels on-chip (zx_folded 128/256/512 + c2r + 1024 + mega) ==="
timeout 3600 python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "=== bench: default route ==="
BENCH_E2E=0 timeout 2400 python bench.py

echo "AB_DONE"
