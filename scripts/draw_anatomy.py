"""Attribute the fused draw-chain kernel's time to its stages, on-chip.

The 512^3 draws stage measured 14.2 ms (runs/ab_xpass_r5.log) -- the
largest single stage of the step and outside both rooflines (VPU-bound).
Before optimizing, measure where it goes: each probe kernel runs a
truncated chain over the same (half, Z, X) grid and writes one f32 plane
pair, so deltas between consecutive probes attribute time to
  madd    : the affine jump (one 128-bit madd against the (z,x) tables)
  xslrr1  : + draw-1 XSL-RR output permutation
  unif1   : + draw-1 (0,1] conversion
  bump    : + the second LCG step
  draw2   : + draw-2 XSL-RR + conversion
  full    : + Box-Muller (log, sqrt, cos, sin) == the product chain

Timing: bench.py's in-jit fori chain (per-step device time, dispatch
overhead cancels).  Usage (detached on the TPU):
  setsid nohup python scripts/draw_anatomy.py > runs/draw_anatomy.log 2>&1 &
Env: ANAT_PPD (default 512), ANAT_REPS (default 6).
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

from zeldovich_tpu.ops import pcg
from zeldovich_tpu.ops.pallas_synth import (
    _bump,
    _draw_chain,
    _madd128,
    _uniform,
    _u32_to_f,
    _xsl_rr,
)

PPD = int(os.environ.get("ANAT_PPD", "512"))
REPS = int(os.environ.get("ANAT_REPS", "6"))
half, Z, X = PPD // 2, PPD, PPD
fdt = jnp.float32


def _chain_body(stage, s, pk):
    """The truncated draw chain for one probe stage -> (re, im)."""
    if stage == "product":
        # the REAL product chain (honors ZT_DRAW_FAST): A/B fast-vs-exact
        # semantics across separate processes
        return _draw_chain(*s, pk, jnp.float32(1.0), False, fdt)
    if stage == "madd":
        # touch all limbs so nothing DCEs
        v = _u32_to_f(s[0] ^ s[1], fdt) + _u32_to_f(s[2] ^ s[3], fdt)
        return v, v * fdt(0.5)
    lo, hi = _xsl_rr(*s)
    if stage == "xslrr1":
        v = _u32_to_f(lo, fdt) + _u32_to_f(hi, fdt)
        return v, v * fdt(0.5)
    R = _uniform(lo, hi, fdt)
    if stage == "unif1":
        return R, R * fdt(0.5)
    s = _bump(*s)
    if stage == "bump":
        v = R + _u32_to_f(s[0] ^ s[3], fdt)
        return v, v * fdt(0.5)
    lo, hi = _xsl_rr(*s)
    T = _uniform(lo, hi, fdt)
    if stage == "draw2":
        return R, T
    amp = jnp.sqrt(-pk * jnp.log(R))
    theta = fdt(2 * np.pi) * T
    return amp * jnp.cos(theta), amp * jnp.sin(theta)


def _probe_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
                  re_ref, im_ref, *, stage):
    y = pl.program_id(0)
    m = (m0[...], m1[...], m2[...], m3[...])
    c = (c0[...], c1[...], c2[...], c3[...])
    plane = tuple(plane_ref[y, j] for j in range(4))
    s = _madd128(m, tuple(jnp.full_like(m[0], p) for p in plane), c)
    re, im = _chain_body(stage, s, pk_ref[0])
    re_ref[0] = re
    im_ref[0] = im


def _twotab_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3,
                   n0, n1, n2, n3, d0, d1, d2, d3, pk_ref,
                   re_ref, im_ref):
    """Doubled-tables variant (VERDICT r4 #4: 'measure it'): draw-2 state
    from a SECOND madd against pre-bumped-twice tables instead of an
    in-register bump.  Same 128-bit product count, 2x the table loads."""
    from zeldovich_tpu.ops import pcg_device

    y = pl.program_id(0)
    plane = tuple(plane_ref[y, j] for j in range(4))
    m = (m0[...], m1[...], m2[...], m3[...])
    c = (c0[...], c1[...], c2[...], c3[...])
    m2t = (n0[...], n1[...], n2[...], n3[...])
    c2t = (d0[...], d1[...], d2[...], d3[...])
    pb = tuple(jnp.full_like(m[0], p) for p in plane)
    s1 = _madd128(m, pb, c)
    s2 = _madd128(m2t, pb, c2t)
    pk = pk_ref[0]
    lo, hi = _xsl_rr(*s1)
    R = pcg_device.fast_uniform_f32(lo, hi)
    lo, hi = _xsl_rr(*s2)
    T = pcg_device.fast_uniform_f32(lo, hi)
    amp = jnp.sqrt(-pk * jnp.log(R))
    cosv, sinv = pcg_device.sincos_2pi(T, fdt)
    re_ref[0] = amp * cosv
    im_ref[0] = amp * sinv


@partial(jax.jit, static_argnames=("stage",))
def probe(planes, mzx, czx, pk, stage, mzx2=None, czx2=None):
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    tile3 = pl.BlockSpec((1, Z, X), lambda y: (i32(y), i32(0), i32(0)))
    mspec = pl.BlockSpec((Z, X), lambda y: (i32(0), i32(0)))
    pspec = pl.BlockSpec(
        planes.shape, lambda y: (i32(0), i32(0)), memory_space=pltpu.SMEM
    )
    out_shape = (
        jax.ShapeDtypeStruct((half, Z, X), jnp.float32),
        jax.ShapeDtypeStruct((half, Z, X), jnp.float32),
    )
    interp = jax.default_backend() == "cpu"
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if stage == "twotab":
        return pl.pallas_call(
            _twotab_kernel,
            out_shape=out_shape,
            grid=(half,),
            in_specs=[pspec] + [mspec] * 16 + [tile3],
            out_specs=(tile3, tile3),
            compiler_params=params,
            interpret=interp,
        )(planes, *mzx, *czx, *mzx2, *czx2, pk)
    return pl.pallas_call(
        partial(_probe_kernel, stage=stage),
        out_shape=out_shape,
        grid=(half,),
        in_specs=[pspec] + [mspec] * 8 + [tile3],
        out_specs=(tile3, tile3),
        compiler_params=params,
        interpret=interp,
    )(planes, *mzx, *czx, pk)


# -- tables (the real product tables for this ppd) --------------------------
from zeldovich_tpu.ops import pcg_device

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

# doubled tables: one more LCG step folded in -> draw-2 state by a second
# madd (m2 = MULT*m, c2 = MULT*c + INC, both elementwise over the grid)
_mc = pcg_device._const_tuple(pcg_device.MULT_LIMBS)
mzx2 = jax.jit(pcg_device.mul128)(_mc, mzx)
czx2 = jax.jit(pcg_device.bump)(czx)


def bracket(stage):
    from jax import lax

    eps = jnp.asarray(1e-30, jnp.float32)

    @jax.jit
    def chain(pk, k):
        def body(i, carry):
            re, im = probe(
                planes, mzx, czx, pk + carry * eps, stage,
                mzx2=mzx2, czx2=czx2,
            )
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


res = {
    "ppd": PPD,
    "platform": jax.devices()[0].platform,
    "draw_fast": os.environ.get("ZT_DRAW_FAST", "1"),
}
prev = None
stages = os.environ.get(
    "ANAT_STAGES", "madd,xslrr1,unif1,bump,draw2,full,product,twotab"
).split(",")
for stage in stages:
    try:
        t = bracket(stage)
        res[stage + "_ms"] = round(t * 1e3, 2)
        if prev is not None:
            res[stage + "_delta_ms"] = round((t - prev) * 1e3, 2)
        prev = t
    except Exception as e:
        res[stage] = f"FAILED: {type(e).__name__}: {e}"
        break
    print(json.dumps(res), flush=True)
print(json.dumps(res), flush=True)
