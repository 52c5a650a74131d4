#!/bin/bash
# Round-5 on-chip campaign, part 4: c2r-form decision on the SHIPPED route.
# Interleaved A/B (concat, perz, concat, perz) of the mega stage so slow
# drift can't masquerade as a form effect, then on-chip parity of perz.
set -x
cd /root/repo
mkdir -p runs

for form in concat perz concat perz; do
  echo "=== mega stage, ZT_C2R_FORM=$form ==="
  PROF_STAGES=mega ZT_C2R_FORM=$form timeout 1800 python scripts/profile_step.py
done

echo "=== on-chip parity: perz c2r (pinned highest precision) ==="
ZT_C2R_FORM=perz VAL_N=512 VAL_1024=0 timeout 2400 python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "MEGAAB_DONE"
