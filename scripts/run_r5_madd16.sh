#!/bin/bash
# Round-5 on-chip campaign, part 5: the 16-bit-column madd A/B, then the
# step-time scaling curve (VERDICT r4 #6).  Interleaved gate A/B on the
# draws stage (where madd+bump live) and the shipped mega route.
set -x
cd /root/repo
mkdir -p runs

for gate in 0 1 0 1; do
  echo "=== draws+mega, ZT_MADD16=$gate ==="
  PROF_STAGES=draws,mega ZT_MADD16=$gate timeout 2400 python scripts/profile_step.py
done

echo "=== on-chip parity of the mega route under ZT_MADD16=1 ==="
ZT_MADD16=1 VAL_N=512 VAL_1024=0 timeout 2400 python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "=== scaling curve (256/512 x nonPLT/PLT in-core, 1024 slab) ==="
timeout 7200 python scripts/scaling_curve.py
echo "SCALING_EXIT=$?"

echo "MADD16_DONE"
