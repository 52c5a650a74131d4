#!/bin/bash
# Round-5 on-chip campaign, part 6: does software-pipelining the mega
# kernel (ZT_MEGA_PIPE: draw row i on the VPU while dotting row i-1 on
# the MXU from VMEM scratch) overlap the two units?
#
# 1. overlap_probe.py isolates the scheduling question: independent
#    draws / dots / both in one kernel body.
# 2. Interleaved A/B (off, on, off, on) of the kernel-only stage (megak)
#    and the full mega step so drift can't masquerade as a form effect.
# 3. On-chip parity of the pipelined route, then bench under the gate.
set -x
cd /root/repo
mkdir -p runs

echo "=== overlap probe: draws / dots / both in one body ==="
timeout 3000 python scripts/overlap_probe.py

for pipe in 0 1 0 1; do
  echo "=== megak + mega, ZT_MEGA_PIPE=$pipe ==="
  PROF_STAGES=megak,mega ZT_MEGA_PIPE=$pipe timeout 2400 \
    python scripts/profile_step.py
done

echo "=== on-chip parity: pipelined mega (pinned highest precision) ==="
ZT_MEGA_PIPE=1 VAL_N=512 VAL_1024=0 timeout 2400 \
  python scripts/validate_c2r_tpu.py
echo "VALIDATE_EXIT=$?"

echo "=== bench: pipelined route ==="
ZT_MEGA_PIPE=1 BENCH_E2E=0 timeout 2400 python bench.py
echo "BENCH_EXIT=$?"

echo "PIPE_DONE"
