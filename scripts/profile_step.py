"""Stage-level timing of the 512^3 half-spectrum step on the real chip.

Times via the in-jit fori-loop chain (bench.py's method: K steps in ONE
dispatch with a scalar data dependency, so the remote tunnel's
per-dispatch overhead cancels exactly in the chain(K)-chain(1) delta):
  draws     -- the fused Pallas draw chain alone
  synthraw  -- the fused pack kernel, no ky0 fixup
  synth     -- synthesize_half_pair (pack + fixup)
  synth_zx  -- synthesis + z and x transforms (no c2r y)
  full      -- the whole separate-kernel step
  mega      -- the fused mega route (PROF_MEGA=1)

The deltas locate the time: transforms = full - synth; each stage's
share guides optimization.

Usage: detached on the TPU --
  setsid nohup python scripts/profile_step.py > runs/profile_step.log 2>&1 &
Env: PROF_PPD (default 512), PROF_REPS (default 6).
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
from functools import partial

from zeldovich_tpu.models.pipeline import Zeldovich
from zeldovich_tpu.utils.params import Parameters

PPD = int(os.environ.get("PROF_PPD", "512"))
REPS = int(os.environ.get("PROF_REPS", "6"))

assets = Path(__file__).parent.parent / "zeldovich_tpu" / "assets"
param = Parameters.from_dict(
    dict(
        BoxSize=720.0,
        NP=PPD**3,
        CPD=PPD,
        ICFormat="RVZel",
        InitialConditionsDirectory="/tmp/prof_ic",
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
cfg, tables, pk_eff = model.cfg, model.tables, model.pk_eff


@partial(jax.jit, static_argnames=("stage",))
def run(tables, pk_eff, stage: str):
    from zeldovich_tpu.ops import mmfft
    from zeldovich_tpu.ops.modes_real import synthesize_half_pair

    if stage == "draws":
        # the fused Pallas draw chain alone: what synthesis costs before
        # the XLA-side field math + pm-packing
        from zeldovich_tpu.ops.pallas_synth import halfspace_boxmuller_pallas

        D_re, D_im = halfspace_boxmuller_pallas(
            tables.planes, tables.mzx, tables.czx, pk_eff, None,
            fixed_power=cfg.fixed_power,
        )
        return D_re + D_im
    if stage == "synthraw":
        # the fused pack kernel alone, no ky0 fixup: isolates the fix cost
        from zeldovich_tpu.ops.pallas_synth import halfspace_pack_pallas

        return halfspace_pack_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
            fixed_power=cfg.fixed_power, just_density=cfg.just_density,
        )
    if stage in ("mega", "megak"):
        # the fused synth+pack+zx kernel (ZT_PALLAS_MEGA candidate
        # route); "megak" stops before the c2r y-transform to attribute
        # kernel-only time (the ZT_MEGA_PIPE A/B)
        from zeldovich_tpu.ops.pallas_fft import c2r_y_folded_pallas
        from zeldovich_tpu.ops.pallas_synth import halfspace_pack_zx_pallas

        g = halfspace_pack_zx_pallas(
            cfg, tables.planes, tables.mzx, tables.czx, pk_eff,
            fixed_power=cfg.fixed_power, just_density=cfg.just_density,
        )
        if stage == "megak":
            return g
        return c2r_y_folded_pallas(g)
    spm = synthesize_half_pair(cfg, tables, dtype=jnp.float32, pk_eff=pk_eff)
    if stage == "synth":
        return spm
    if stage == "full":
        # the product step: routes through the folded Pallas zx kernel on
        # TPU (use_zx_folded) exactly like _half_pair_forward
        return mmfft.ifft3_half_pair(spm)
    from zeldovich_tpu.ops.pallas_fft import use_zx_folded, zx_folded_pallas

    if use_zx_folded(spm.dtype, spm.shape[-1]):
        g = zx_folded_pallas(spm, +1)
        if stage == "synth_zx":
            return g
        return mmfft.c2r_y_pair(g)
    re, im = spm[..., 0, :, :, :], spm[..., 1, :, :, :]
    for ax in (-2, -1):
        re, im = mmfft.cfft_axis(re, im, ax, +1)
    if stage == "synth_zx":
        return re + im  # force both live
    return mmfft.c2r_y_pair(jnp.stack([re, im], axis=-4))


def bracket(stage):
    """Per-step device time of one stage via the in-jit chain delta."""
    from jax import lax

    eps = jnp.asarray(1e-30, pk_eff.dtype)

    @jax.jit
    def chain(pk, k):
        def body(i, carry):
            out = run(tables, pk + carry * eps, stage)
            leaf = jax.tree.leaves(out)[0]
            return leaf[(0,) * leaf.ndim].astype(pk.dtype)

        return lax.fori_loop(0, k, body, jnp.zeros((), pk.dtype))

    np.asarray(chain(pk_eff, 1))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(chain(pk_eff, 1))
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(pk_eff, REPS + 1))
    t_k = time.perf_counter() - t0
    return max((t_k - t_one) / REPS, 1e-9)


res = {"ppd": PPD, "platform": jax.devices()[0].platform}
stages = ["draws", "synthraw", "synth", "synth_zx", "full"]
if os.environ.get("PROF_MEGA", "1") != "0":  # the default product route
    stages.append("mega")
if os.environ.get("PROF_STAGES"):  # restrict (e.g. a c2r-only A/B)
    stages = os.environ["PROF_STAGES"].split(",")
for stage in stages:
    try:
        res[stage] = round(bracket(stage), 4)
    except Exception as e:  # one failing stage must not kill the run
        res[stage] = f"FAILED: {type(e).__name__}"
    print(json.dumps(res), flush=True)
if all(isinstance(res.get(s), float)
       for s in ["draws", "synthraw", "synth", "synth_zx", "full"]):
    res["draws_ms"] = round(res["draws"] * 1e3, 1)
    res["pack_ms"] = round((res["synth"] - res["draws"]) * 1e3, 1)
    res["zx_ms"] = round((res["synth_zx"] - res["synth"]) * 1e3, 1)
    res["c2r_ms"] = round((res["full"] - res["synth_zx"]) * 1e3, 1)
    res["synth_ms"] = round(res["synth"] * 1e3, 1)
elif all(isinstance(res.get(s), float) for s in ["synth_zx", "full"]):
    res["c2r_ms"] = round((res["full"] - res["synth_zx"]) * 1e3, 1)
print(json.dumps(res), flush=True)
