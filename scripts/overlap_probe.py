"""Do VPU draws and MXU dots overlap inside one Mosaic kernel body?

The mega kernel (pallas_synth.halfspace_pack_zx_pallas) serializes, per
grid row, ~12 ms of VPU draw-chain work and ~12 ms of MXU folded-DFT
work because the dots consume the draws.  If Mosaic/LLO interleaves
*independent* vector and matrix instructions inside one kernel body, a
software-pipelined variant (draw row y, dot row y-1 from VMEM scratch)
would hide one stage under the other -- the largest untried lever left
in DESIGN SS24.

This probe measures the hypothesis before any kernel rewrite:
  draws : the real product draw chain per row          (VPU-only)
  dots  : 4 independent complex folded zx transforms
          per row on pk-derived planes -- the mega
          kernel's exact per-row MXU load (narray=2)    (MXU-heavy)
  both  : the two above in ONE straight-line body,
          fully independent until a final add           (mixed)

both ~= max(draws, dots)  -> the scheduler overlaps; pipeline the kernel.
both ~= draws + dots      -> it serializes; measured-no, file in SS24.

Timing: bench.py's in-jit fori chain.  Usage (detached on the TPU):
  setsid nohup python scripts/overlap_probe.py > runs/overlap_r5.log 2>&1 &
Env: OVL_PPD (default 512), OVL_REPS (default 6).
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zeldovich_tpu.ops import pcg, pcg_device
from zeldovich_tpu.ops.pallas_fft import (
    _fold_mats,
    _folded_axis0,
    _folded_xpass,
    _pallas_precision,
)
from zeldovich_tpu.ops.pallas_synth import _draw_chain, _madd128

PPD = int(os.environ.get("OVL_PPD", "512"))
REPS = int(os.environ.get("OVL_REPS", "6"))
half, Z, X = PPD // 2, PPD, PPD
fdt = jnp.float32
interp = jax.default_backend() == "cpu"
prec = _pallas_precision()


def _kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
            cc_ref, ss_ref, alt_ref, re_ref, im_ref, *, mode):
    y = pl.program_id(0)
    pk = pk_ref[0]
    acc_r = jnp.zeros_like(pk)
    acc_i = jnp.zeros_like(pk)
    if mode in ("draws", "both"):
        m = (m0[...], m1[...], m2[...], m3[...])
        c = (c0[...], c1[...], c2[...], c3[...])
        plane = tuple(plane_ref[y, j] for j in range(4))
        s = _madd128(m, tuple(jnp.full_like(m[0], p) for p in plane), c)
        d_re, d_im = _draw_chain(*s, pk, fdt(1.0), False, fdt)
        acc_r = acc_r + d_re
        acc_i = acc_i + d_im
    if mode in ("dots", "both"):
        Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
        # the mega kernel's per-row MXU load at narray=2: 4 independent
        # complex (z, x) folded transform pairs
        for rep in range(4):
            sc = fdt(0.25 * (rep + 1))
            r, i = _folded_axis0(pk * sc, pk * (sc * 0.5), Cc, Ss, alt,
                                 fdt(1.0), prec, interp)
            r, i = _folded_xpass(r, i, Cc, Ss, alt, fdt(1.0), prec, interp)
            acc_r = acc_r + r
            acc_i = acc_i + i
    re_ref[0] = acc_r
    im_ref[0] = acc_i


@partial(jax.jit, static_argnames=("mode",))
def probe(planes, mzx, czx, pk, Cc, Ss, alt, mode):
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    tile3 = pl.BlockSpec((1, Z, X), lambda y: (i32(y), i32(0), i32(0)))
    mspec = pl.BlockSpec((Z, X), lambda y: (i32(0), i32(0)))
    pspec = pl.BlockSpec(
        planes.shape, lambda y: (i32(0), i32(0)), memory_space=pltpu.SMEM
    )
    matspec = lambda shp: pl.BlockSpec(
        shp, lambda y: tuple(i32(0) for _ in shp)
    )
    out_shape = (
        jax.ShapeDtypeStruct((half, Z, X), jnp.float32),
        jax.ShapeDtypeStruct((half, Z, X), jnp.float32),
    )
    return pl.pallas_call(
        partial(_kernel, mode=mode),
        out_shape=out_shape,
        grid=(half,),
        in_specs=[pspec] + [mspec] * 8 + [tile3]
        + [matspec(Cc.shape), matspec(Ss.shape), matspec(alt.shape)],
        out_specs=(tile3, tile3),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interp,
    )(planes, *mzx, *czx, pk, Cc, Ss, alt)


# -- the real product tables for this ppd (as draw_anatomy.py) --------------
mz, cz = pcg.axis_affine_tables(PPD, 2 * pcg.MAX_PPD)
mz, cz = pcg.prebump_axis_tables(mz, cz)
mx, cx = pcg.axis_affine_tables(PPD, 2)
unpack = lambda a: tuple(jnp.asarray(a[:, j]) for j in range(4))
mzt, czt = unpack(mz), unpack(cz)
mxt, cxt = unpack(mx), unpack(cx)
mzx, czx = jax.jit(pcg_device.compose_affine)(
    tuple(m[:, None] for m in mzt), tuple(c[:, None] for c in czt),
    tuple(m[None, :] for m in mxt), tuple(c[None, :] for c in cxt),
)
planes = jnp.stack(
    [jnp.asarray(v) for v in
     (lambda t: tuple(t[:, j] for j in range(4)))(
         pcg.plane_state_table(12346, PPD))],
    axis=-1,
)
rng = np.random.default_rng(3)
pk = jnp.asarray(rng.uniform(0.5, 2.0, size=(half, Z, X)), jnp.float32)
Cc, Ss, alt = (jnp.asarray(m) for m in _fold_mats(Z))


def bracket(mode):
    from jax import lax

    eps = jnp.asarray(1e-30, jnp.float32)

    @jax.jit
    def chain(pk, k):
        def body(i, carry):
            re, im = probe(planes, mzx, czx, pk + carry * eps,
                           Cc, Ss, alt, mode)
            return re[0, 0, 0] + im[0, 0, 0]

        return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    np.asarray(chain(pk, 1))
    t0 = time.perf_counter()
    np.asarray(chain(pk, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(pk, REPS + 1))
    tk = time.perf_counter() - t0
    return max((tk - t1) / REPS, 1e-9)


res = {"ppd": PPD, "platform": jax.devices()[0].platform,
       "prec": str(prec)}
for mode in ("draws", "dots", "both"):
    try:
        res[mode + "_ms"] = round(bracket(mode) * 1e3, 2)
    except Exception as e:  # noqa: BLE001
        res[mode + "_ms"] = f"FAILED: {type(e).__name__}: {e}"
    print(json.dumps(res), flush=True)
if all(isinstance(res.get(k + "_ms"), float) for k in
       ("draws", "dots", "both")):
    s = res["draws_ms"] + res["dots_ms"]
    m = max(res["draws_ms"], res["dots_ms"])
    res["serial_sum_ms"] = round(s, 2)
    res["overlap_frac"] = round(
        (s - res["both_ms"]) / max(s - m, 1e-9), 3
    )
    print(json.dumps(res), flush=True)
