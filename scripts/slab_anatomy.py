"""Where do the 1024^3 OOC slab-step's seconds go?

The chain-timed slab measurement (runs/slab_retry.log) puts one
32-row y-slab at ~8 s on a v5e -- ~300x the work-equivalent in-core
rate (a 512^3 full zx stage is ~21 ms for 8x the per-row work).  This
probes the two stages separately on-chip:

  synth : synthesize_pair at the slab index block (draws + fields +
          packing, elementwise Hermitian-source form)
  zx    : the in-plane transform of the synthesized slab
          (zx_tiled_pallas at n=1024 / whatever the gates route)
  synthD: synthesize_pair with just_density (D only) -- isolates the
          field/packing tail from the draw chain

Timing: bench.py's in-jit fori chain.  Usage (detached on the TPU):
  setsid nohup python scripts/slab_anatomy.py > runs/slab_anatomy.log 2>&1 &
Env: SLAB_PPD (default 1024), SLAB_NY (default 16), SLAB_REPS (4).
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

root = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(root))

import jax

jax.config.update("jax_enable_x64", True)
from zeldovich_tpu.utils.backend import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax import lax

from zeldovich_tpu.models.pipeline import Zeldovich
from zeldovich_tpu.utils.params import Parameters

PPD = int(os.environ.get("SLAB_PPD", "1024"))
NY = int(os.environ.get("SLAB_NY", "16"))
REPS = int(os.environ.get("SLAB_REPS", "4"))
ys = (PPD // 2) // NY

assets = root / "zeldovich_tpu" / "assets"
param = Parameters.from_dict(dict(
    BoxSize=720.0, NP=PPD**3, CPD=PPD, ICFormat="RVZel",
    InitialConditionsDirectory="/tmp/slab_anat", InitialRedshift=49.0,
    ZD_Seed=12346, ZD_NumBlock=2, ZD_Pk_scale=1.0, ZD_Pk_norm=8.0,
    ZD_Pk_sigma=0.0210839935761, ZD_Pk_smooth=0.0,
    ZD_Pk_filename=str(assets / "wmap1new.pow"), ZD_Version=2,
))
model = Zeldovich(param, dtype=jnp.float32)
cfg, tables = model.cfg, model.tables

from zeldovich_tpu.ops.modes_real import synthesize_pair
from zeldovich_tpu.ops.pallas_fft import (
    use_zx_folded,
    use_zx_tiled,
    zx_tiled_pallas,
)

print(json.dumps({
    "ppd": PPD, "ny_slabs": NY, "rows": ys,
    "zx_folded_gate": use_zx_folded(jnp.float32, PPD),
    "zx_tiled_gate": use_zx_tiled(jnp.float32, PPD),
}), flush=True)

pallas_ok = (
    jax.default_backend() == "tpu"
    and os.environ.get("SLAB_NO_PALLAS_DRAW") != "1"
)


@partial(jax.jit, static_argnames=("stage", "k"))
def chain(tables, stage, k):
    def synth(i):
        y = (i + jnp.arange(ys))[:, None, None]
        z = jnp.arange(PPD)[None, :, None]
        x = jnp.arange(PPD)[None, None, :]
        return synthesize_pair(y, z, x, cfg, tables, dtype=jnp.float32,
                               allow_pallas=pallas_ok)

    def body(i, acc):
        if stage == "synth":
            r = synth(i)
        elif stage == "zx":
            base = synth(0)  # loop-invariant; hoisted by XLA, so this
            # chain times (zx + hoist-residue); the synth chain is the
            # subtraction partner
            r = zx_tiled_pallas(base + acc * jnp.float32(1e-30), +1)
        elif stage == "zx_xla":
            base = synth(0)
            p = base + acc * jnp.float32(1e-30)
            p = jnp.swapaxes(p, 0, 1)
            from zeldovich_tpu.ops import mmfft
            for ax in (-2, -1):
                re, im = mmfft.cfft_axis(p[0], p[1], ax, +1)
                p = jnp.stack([re, im])
            r = jnp.swapaxes(p, 0, 1)
        elif stage == "noop":
            # control: one elementwise pass over the same slab buffer --
            # bounds the chain-methodology overhead at these shapes
            base = synth(0)
            r = base * (jnp.float32(1.0) + acc * jnp.float32(1e-30))
        else:  # full
            r = synth(i)
            r = zx_tiled_pallas(r, +1)
        return acc + r[(0,) * r.ndim]

    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))


res = {}
stages = os.environ.get("SLAB_STAGES", "synth,zx,full").split(",")
for stage in stages:
    try:
        np.asarray(chain(tables, stage, 1))
        t0 = time.perf_counter()
        np.asarray(chain(tables, stage, 1))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(chain(tables, stage, REPS + 1))
        tk = time.perf_counter() - t0
        res[stage + "_ms"] = round(max(tk - t1, 0.0) / REPS * 1e3, 1)
    except Exception as e:  # noqa: BLE001
        res[stage + "_ms"] = f"FAILED: {type(e).__name__}: {e}"
    print(json.dumps(res), flush=True)
