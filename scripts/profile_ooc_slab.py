"""A/B timing of the out-of-core slab kernels: folded Pallas vs XLA.

Times one y-slab synth+zx pass and one z-slab y-transform at OOC scale
(default ppd=1024, ny/bz=8) on the real chip, fetch-bracketed, for both
routes (ZT_NO_PALLAS_* gates flipped in-process via env before trace).

Usage (detached): setsid nohup python scripts/profile_ooc_slab.py \
    > runs/profile_ooc_slab.log 2>&1 &
Env: OOC_PPD (default 1024), OOC_NY (default 8), OOC_REPS (default 4).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
from zeldovich_tpu.utils.backend import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

from zeldovich_tpu.models.outofcore import _ifft_y_pair, _synth_ifft_zx_pair
from zeldovich_tpu.models.pipeline import Zeldovich
from zeldovich_tpu.utils.params import Parameters

PPD = int(os.environ.get("OOC_PPD", "1024"))
NY = int(os.environ.get("OOC_NY", "8"))
REPS = int(os.environ.get("OOC_REPS", "4"))

assets = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"
param = Parameters.from_dict(
    dict(
        BoxSize=720.0,
        NP=PPD**3,
        CPD=PPD,
        ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/prof_ooc",
        InitialRedshift=49.0,
        ZD_Seed=12346,
        ZD_NumBlock=2,
        ZD_Pk_scale=1.0,
        ZD_Pk_norm=8.0,
        ZD_Pk_sigma=0.0210839935761,
        ZD_Pk_smooth=0.0,
        ZD_Pk_filename=str(assets / "wmap1new.pow"),
        ZD_Version=2,
    )
)
model = Zeldovich(param, dtype=jnp.float32)
cfg, tables = model.cfg, model.tables
print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(3)
zslab = jnp.asarray(
    rng.normal(size=(param.narray, 2, PPD, NY, PPD)), jnp.float32
)


def probe_fetch(x):
    leaf = jax.tree.leaves(x)[0]
    idx = (0,) * (leaf.ndim - 1) + (slice(0, 4),)
    return np.asarray(leaf[idx])


def bracket(f):
    probe_fetch(f())
    t0 = time.perf_counter()
    probe_fetch(f())
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = f()
    probe_fetch(out)
    tc = time.perf_counter() - t0
    return max((tc - t1) / (REPS - 1), 1e-9)


res = {"ppd": PPD, "ny": NY}
y0 = jnp.int32(0)
res["synth_zx_pallas_s"] = round(
    bracket(lambda: _synth_ifft_zx_pair(y0, NY, cfg, tables, jnp.float32)), 4
)
res["ifft_y_pallas_s"] = round(bracket(lambda: _ifft_y_pair(zslab)), 4)
print(json.dumps(res), flush=True)

# XLA route: flip the gate and retrace (new jit keys via cache-bust copy)
os.environ["ZT_NO_PALLAS_FFT"] = "1"
_synth_ifft_zx_pair.clear_cache()
_ifft_y_pair.clear_cache()
res["synth_zx_xla_s"] = round(
    bracket(lambda: _synth_ifft_zx_pair(y0, NY, cfg, tables, jnp.float32)), 4
)
res["ifft_y_xla_s"] = round(bracket(lambda: _ifft_y_pair(zslab)), 4)
print(json.dumps(res), flush=True)
