#!/bin/bash
# Round-5 campaign, part 8: refresh the scaling artifact on the new
# pair default, and measure the opt-in PLT pair form.
#
# 1. Re-record the non-PLT in-core points (256/512 now route through
#    ZT_MEGA_PAIR=2) and the 1024^3 slab point (chain-timed: the two
#    earlier cuts were wrong in opposite directions -- dispatch-only
#    0.8 ms, then a ~16 s/call eager argument-upload tax).
# 2. PLT 512^3 interleaved A/B of ZT_MEGA_PAIR 0/2: the PLT out window
#    (~67 MB double-buffered) presses the VMEM limit, so this measures
#    whether the form compiles and wins before any default change.
# 3. On-chip PLT pair-vs-serial parity (both jit, max |diff|).
set -x
cd /root/repo
mkdir -p runs

echo "=== scaling refresh: 256/512 non-PLT (pair default) + 1024 slab ==="
SCAL_ONLY=256:0,512:0,slab timeout 7200 python scripts/scaling_curve.py

for pair in 0 2 0 2; do
  echo "=== bench PLT, ZT_MEGA_PAIR=$pair ==="
  ZT_MEGA_PAIR=$pair BENCH_PLT=1 BENCH_E2E=0 timeout 2400 python bench.py
done

echo "=== on-chip PLT pair-vs-serial parity ==="
timeout 2400 python - <<'EOF'
import os, sys, time
from pathlib import Path
sys.path.insert(0, str(Path.cwd()))
import jax
jax.config.update("jax_enable_x64", True)
from zeldovich_tpu.utils.backend import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from zeldovich_tpu.models.pipeline import Zeldovich
from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas
from zeldovich_tpu.utils.params import Parameters

assets = Path("zeldovich_tpu/assets")
ppd = int(os.environ.get("PLTPAR_PPD", "512"))
param = Parameters.from_dict(dict(
    BoxSize=720.0, NP=ppd**3, CPD=ppd, ICFormat="RVZel",
    InitialConditionsDirectory="/tmp/val_pairplt", InitialRedshift=49.0,
    ZD_Seed=12346, ZD_NumBlock=2, ZD_Pk_scale=1.0, ZD_Pk_norm=8.0,
    ZD_Pk_sigma=0.0210839935761, ZD_Pk_smooth=0.0,
    ZD_Pk_filename=str(assets / "wmap1new.pow"), ZD_Version=2,
    ZD_qPLT=1, ZD_PLT_filename=str(assets / "eigmodes128"),
    ZD_qPLT_rescale=1, ZD_PLT_target_z=5.0,
))
model = Zeldovich(param, dtype=jnp.float32)
cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff
kw = dict(fixed_power=cfg.fixed_power, just_density=cfg.just_density,
          plt_coefs=model.plt_coefs)

os.environ["ZT_MEGA_PAIR"] = "0"
halfspace_pack_zx_pallas.clear_cache()
@jax.jit
def serial(tables, pk_eff):
    return halfspace_pack_zx_pallas(
        cfg, tables.planes, tables.mzx, tables.czx, pk_eff, **kw)
base = serial(tables, pk_eff)

os.environ["ZT_MEGA_PAIR"] = "2"
halfspace_pack_zx_pallas.clear_cache()
@jax.jit
def paired(tables, pk_eff):
    return halfspace_pack_zx_pallas(
        cfg, tables.planes, tables.mzx, tables.czx, pk_eff, **kw)
pair = paired(tables, pk_eff)

half = base.shape[3] - 1
d = jnp.abs(base[:, :, :, :half] - pair).max()
s = jnp.abs(base).max()
print("plt_pair_512: absdiff=%.3e scale=%.3e" %
      (float(np.asarray(d)), float(np.asarray(s))), flush=True)
print("PLT_PAIR_PARITY", "OK" if float(np.asarray(d)) == 0.0 else "DIFF",
      flush=True)
EOF
echo "PLTPAIR_EXIT=$?"
echo "PAIR2_DONE"
