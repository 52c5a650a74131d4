#!/bin/bash
# Round-5 on-chip campaign, part 3: fixed draw anatomy + c2r form A/B.
set -x
cd /root/repo
mkdir -p runs

echo "=== draw anatomy (fast semantics + twotab, vmem-capped probes) ==="
ZT_DRAW_FAST=1 timeout 3000 python scripts/draw_anatomy.py

echo "=== draw product stage, exact semantics (A/B) ==="
ZT_DRAW_FAST=0 ANAT_STAGES=product timeout 1200 python scripts/draw_anatomy.py

echo "=== c2r form A/B: concat (default) vs perz ==="
PROF_STAGES=synth_zx,full ZT_C2R_FORM=concat timeout 1800 python scripts/profile_step.py
PROF_STAGES=synth_zx,full ZT_C2R_FORM=perz timeout 1800 python scripts/profile_step.py

echo "C2R_DONE"
