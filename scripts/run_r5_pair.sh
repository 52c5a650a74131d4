#!/bin/bash
# Round-5 on-chip campaign, part 7: the probe-faithful overlap form.
# ZT_MEGA_PAIR=g computes g rows per grid step in ONE straight-line
# body (no scratch): row r+1's draws are statically independent of row
# r's dots, the exact structure overlap_probe.py measured at 81%
# VPU/MXU overlap (runs/pipe_r5.log).  The scratch-staged ZT_MEGA_PIPE
# form defeated the overlap; this one stays SSA.
#
# 1. Interleaved A/B (0, 2, 0, 4) of kernel-only (megak) and full mega
#    step so drift can't masquerade as a form effect.
# 2. On-chip parity of the winning g (pinned highest precision).
# 3. Bench under the regression gate with the winner.
set -x
cd /root/repo
mkdir -p runs

for pair in 0 2 0 4 2; do
  echo "=== megak + mega, ZT_MEGA_PAIR=$pair ==="
  PROF_STAGES=megak,mega ZT_MEGA_PAIR=$pair timeout 2400 \
    python scripts/profile_step.py
done

echo "=== on-chip parity: paired mega g=2 (pinned highest precision) ==="
ZT_MEGA_PAIR=2 VAL_N=512 VAL_1024=0 timeout 2400 \
  python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "=== bench: paired route g=2 ==="
ZT_MEGA_PAIR=2 BENCH_E2E=0 timeout 2400 python bench.py
echo "BENCH_EXIT=$?"

echo "PAIR_DONE"
