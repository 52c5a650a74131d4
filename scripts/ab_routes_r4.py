"""A/B the transform kernel routes vs their XLA forms at CURRENT defaults.

The pallas-vs-XLA route gates were decided when both sides ran 6-pass
HIGHEST dots; the TPU default is now `high` (bf16x3 in-kernel, 3-pass
XLA), which could shift the winners.  Times each form with the in-jit
fori chain (profile_step's bracket: per-step = (chain(K)-chain(1))/(K-1),
dispatch cancels), on a synthesized half-spectrum at AB_N (default 512).

Usage (detached on the TPU):
  setsid nohup python scripts/ab_routes_r4.py > runs/ab_routes_r4.log 2>&1 &
"""

import json
import os
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
from zeldovich_tpu.utils.backend import enable_compilation_cache

enable_compilation_cache()
import jax.numpy as jnp
import numpy as np
from jax import lax

from zeldovich_tpu.models.pipeline import Zeldovich
from zeldovich_tpu.ops import mmfft
from zeldovich_tpu.ops.pallas_fft import (
    c2r_y_folded_pallas,
    zx_folded_pallas,
)
from zeldovich_tpu.utils.params import Parameters

N = int(os.environ.get("AB_N", "512"))
REPS = int(os.environ.get("AB_REPS", "6"))

assets = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"
param = Parameters.from_dict(
    dict(
        BoxSize=720.0, NP=N**3, CPD=N, ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/ab_routes",
        InitialRedshift=49.0, ZD_Seed=12346, ZD_NumBlock=2,
        ZD_Pk_scale=1.0, ZD_Pk_norm=8.0, ZD_Pk_sigma=0.0210839935761,
        ZD_Pk_smooth=0.0, ZD_Pk_filename=str(assets / "wmap1new.pow"),
        ZD_Version=2,
    )
)
model = Zeldovich(param, dtype=jnp.float32)
from zeldovich_tpu.ops.modes_real import synthesize_half_pair

spm = jax.jit(
    lambda t, pk: synthesize_half_pair(
        model.cfg, t, dtype=jnp.float32, pk_eff=pk
    )
)(model.tables, model.pk_eff)
spm.block_until_ready()
g = jax.jit(partial(zx_folded_pallas, sign=1))(spm)
g.block_until_ready()
print(f"devices: {jax.devices()}  n={N}  spm {spm.shape}", flush=True)


def xla_zx(x):
    re, im = x[..., 0, :, :, :], x[..., 1, :, :, :]
    for ax in (-2, -1):
        re, im = mmfft.cfft_axis(re, im, ax, +1)
    return jnp.stack([re, im], axis=-4)


VARIANTS = {
    "zx_pallas": (spm, lambda x: zx_folded_pallas(x, +1)),
    "zx_xla": (spm, xla_zx),
    "c2r_pallas": (g, c2r_y_folded_pallas),
    "c2r_xla": (g, mmfft.c2r_y_pair),
}


def bracket(name):
    base, fn = VARIANTS[name]
    eps = jnp.asarray(1e-30, jnp.float32)

    @jax.jit
    def chain(x, k):
        def body(i, carry):
            out = fn(x + carry * eps)
            return out[(0,) * out.ndim].astype(jnp.float32)

        return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    np.asarray(chain(base, 1))  # compile + warm
    np.asarray(chain(base, 8))
    # per-step from the best (k=8 - k=1)/7 pair, repeated inline:
    best = None
    for _ in range(REPS):
        t0 = time.perf_counter()
        np.asarray(chain(base, 1))
        tm = time.perf_counter()
        np.asarray(chain(base, 8))
        t2 = time.perf_counter()
        step = ((t2 - tm) - (tm - t0)) / 7.0
        best = step if best is None else min(best, step)
    return best


from zeldovich_tpu.ops.mmfft import precision_name

only = os.environ.get("AB_ONLY")
names = [n for n in VARIANTS if not only or n in only.split(",")]
out = {"n": N, "precision": precision_name()}
for k in ("ZT_C2R_ZB", "ZT_C2R_WIDTH"):
    if os.environ.get(k):
        out[k] = os.environ[k]
for name in names:
    try:
        out[name + "_ms"] = round(bracket(name) * 1e3, 2)
        print(json.dumps(out), flush=True)
    except Exception as e:
        out[name] = f"FAILED {type(e).__name__}: {e}"
        print(json.dumps(out), flush=True)
print("AB_DONE", flush=True)
