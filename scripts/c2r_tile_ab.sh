#!/bin/sh
# A/B the c2r kernel tile sizing on-chip (isolated chain-timed bracket).
# HISTORICAL: produced runs/c2r_tile_ab.log (default 14.8 ms at 512^3;
# every wider config VMEM-OOMed), after which the ZT_C2R_ZB/ZT_C2R_WIDTH
# knobs were removed from pallas_fft.py -- rerunning this script now
# times the fixed default four times.  Re-add the knobs to re-explore.
set -x
for cfg in "8 4096" "8 8192" "16 16384" "16 8192"; do
  set -- $cfg
  ZT_C2R_ZB=$1 ZT_C2R_WIDTH=$2 AB_ONLY=c2r_pallas timeout 1800 \
    python scripts/ab_routes_r4.py
done
echo TILE_AB_DONE
