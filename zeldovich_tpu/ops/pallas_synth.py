"""Pallas TPU kernel for the synthesis hot loop: pcg64 draws + Box-Muller.

Profile: at 256^3 the XLA synthesis path spends ~69 ms vs ~10 ms for the
whole 3-D FFT; the per-mode work is two 128-bit LCG steps, two XSL-RR
output permutations, the uniform conversion, and the Box-Muller
transcendentals.  Its HBM traffic is ~40 B/mode, so a fused kernel is
memory-bound at ~2 ms -- XLA's u64 emulation and fusion leave ~30x on the
table.

This kernel does the whole draw chain in *pure uint32* arithmetic (TPU has
no native 64-bit integers; 32x32 products are built from 16-bit-limb
partial products with explicit carries), entirely in VMEM:

  inputs : the per-mode RNG state after the affine jump (4 u32 planes),
           P(k) per mode, and the zero-rule mask
  outputs: D_re, D_im -- the complex Gaussian deviate scaled by sqrt(P)

The affine jump itself (one 128-bit multiply-add against per-mode table
entries) stays in XLA where its gathers are convenient; the kernel fuses
everything downstream.  Bit-exactness vs ops/pcg_device is asserted in
tests (interpret mode on CPU, compiled on TPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pcg

_U32 = jnp.uint32

# pcg64 LCG constants as 32-bit limbs (little-endian)
_MULT = tuple(int(v) for v in pcg.to_limbs32(pcg.PCG64_MULT))
_INC = tuple(int(v) for v in pcg.to_limbs32(pcg.PCG64_INC))


def _mul32_hi(a, b):
    """High 32 bits of a u32 x u32 product, via 16-bit limbs."""
    mask = _U32(0xFFFF)
    al = a & mask
    ah = a >> _U32(16)
    bl = b & mask
    bh = b >> _U32(16)
    albl = al * bl
    albh = al * bh
    ahbl = ah * bl
    ahbh = ah * bh
    # carry-counted middle sum: mid = albh + ahbl + (albl >> 16)
    mid = albh + ahbl
    c1 = (mid < albh).astype(_U32)  # wrapped?
    t = albl >> _U32(16)
    mid2 = mid + t
    c2 = (mid2 < mid).astype(_U32)
    return ahbh + (mid2 >> _U32(16)) + ((c1 + c2) << _U32(16))


def _addc(a, b, cin):
    """u32 add with carry-in; returns (sum, carry_out)."""
    s1 = a + b
    c1 = (s1 < a).astype(_U32)
    s2 = s1 + cin
    c2 = (s2 < s1).astype(_U32)
    return s2, c1 + c2


def _bump(s0, s1, s2, s3):
    """One pcg64 LCG step (s*MULT + INC mod 2^128) in u32 limbs."""
    m0, m1, m2, m3 = (_U32(m) for m in _MULT)
    i0, i1, i2, i3 = (_U32(i) for i in _INC)

    # column products: result limb k = sum_{i+j=k} (lo of si*mj)
    #                + sum_{i+j=k-1} (hi of si*mj) + carries + INC
    lo = [None] * 4
    hi = [None] * 4  # hi[k] feeds limb k+1
    prods = {}
    for i in range(4):
        s = (s0, s1, s2, s3)[i]
        for j in range(4 - i):
            m = (m0, m1, m2, m3)[j]
            prods[(i, j)] = (s * m, _mul32_hi(s, m))

    zero = jnp.zeros_like(s0)
    # limb 0
    r0, c = _addc(prods[(0, 0)][0], i0, zero)
    carry = c
    # limb 1: lo(0,1)+lo(1,0)+hi(0,0)+i1+carry
    r1, c1 = _addc(prods[(0, 1)][0], prods[(1, 0)][0], zero)
    r1, c2 = _addc(r1, prods[(0, 0)][1], zero)
    r1, c3 = _addc(r1, i1, carry)
    carry = c1 + c2 + c3
    # limb 2: lo(0,2)+lo(1,1)+lo(2,0)+hi(0,1)+hi(1,0)+i2+carry
    r2, c1 = _addc(prods[(0, 2)][0], prods[(1, 1)][0], zero)
    r2, c2 = _addc(r2, prods[(2, 0)][0], zero)
    r2, c3 = _addc(r2, prods[(0, 1)][1], zero)
    r2, c4 = _addc(r2, prods[(1, 0)][1], zero)
    r2, c5 = _addc(r2, i2, carry)
    carry = c1 + c2 + c3 + c4 + c5
    # limb 3 (mod 2^128: carries out are dropped)
    r3 = (
        prods[(0, 3)][0]
        + prods[(1, 2)][0]
        + prods[(2, 1)][0]
        + prods[(3, 0)][0]
        + prods[(0, 2)][1]
        + prods[(1, 1)][1]
        + prods[(2, 0)][1]
        + i3
        + carry
    )
    return r0, r1, r2, r3


def _xsl_rr(s0, s1, s2, s3):
    """XSL-RR output: 64-bit value as (lo32, hi32) u32 pair."""
    rot = s3 >> _U32(26)  # top 6 bits of the 128-bit state
    xlo = s0 ^ s2
    xhi = s1 ^ s3
    # rotate the 64-bit (xhi:xlo) right by rot in [0, 64)
    r32 = rot & _U32(31)
    swap = rot >= _U32(32)
    lo1 = jnp.where(swap, xhi, xlo)
    hi1 = jnp.where(swap, xlo, xhi)
    # now rotate (hi1:lo1) right by r32 < 32
    inv = (_U32(32) - r32) & _U32(31)  # == 0 when r32 == 0
    nz = (r32 != 0).astype(_U32)
    lo = (lo1 >> r32) | jnp.where(nz.astype(bool), hi1 << inv, _U32(0))
    hi = (hi1 >> r32) | jnp.where(nz.astype(bool), lo1 << inv, _U32(0))
    return lo, hi


def _uniform(lo, hi, fdt):
    """(hi:lo)+1 scaled by 2^-64 -> (0, 1], reference rounding semantics."""
    lo1 = lo + _U32(1)
    hi1 = hi + (lo1 == _U32(0)).astype(_U32)
    allones = (lo == _U32(0xFFFFFFFF)) & (hi == _U32(0xFFFFFFFF))
    v = hi1.astype(fdt) * fdt(2.0**-32) + lo1.astype(fdt) * fdt(2.0**-64)
    return jnp.where(allones, fdt(1.0), v)


def _draw_chain(s0, s1, s2, s3, pk, live, fixed_power, fdt):
    """Two draws -> Box-Muller -> (D_re, D_im)."""
    s0, s1, s2, s3 = _bump(s0, s1, s2, s3)
    lo, hi = _xsl_rr(s0, s1, s2, s3)
    R = _uniform(lo, hi, fdt)
    s0, s1, s2, s3 = _bump(s0, s1, s2, s3)
    lo, hi = _xsl_rr(s0, s1, s2, s3)
    T = _uniform(lo, hi, fdt)

    if fixed_power:
        amp = jnp.sqrt(pk)
    else:
        amp = jnp.sqrt(-pk * jnp.log(R))
    theta = fdt(2 * np.pi) * T
    return live * amp * jnp.cos(theta), live * amp * jnp.sin(theta)


def _kernel(s0_ref, s1_ref, s2_ref, s3_ref, pk_ref, live_ref, re_ref, im_ref,
            *, fixed_power, fdt):
    re, im = _draw_chain(
        s0_ref[...],
        s1_ref[...],
        s2_ref[...],
        s3_ref[...],
        pk_ref[...],
        live_ref[...],
        fixed_power,
        fdt,
    )
    re_ref[...] = re
    im_ref[...] = im


@partial(jax.jit, static_argnames=("fixed_power", "interpret"))
def boxmuller_pallas(state, pk, live, fixed_power=False, interpret=None):
    """D = live * cgauss(pk) from per-mode jumped states, fused on-chip.

    state: (..., 4) u32 -- RNG state positioned at the mode's draws
    pk:    (...) float -- P(|k|) per mode
    live:  (...) float -- 0.0 for zeroed modes, 1.0 otherwise
    Returns (D_re, D_im) float arrays shaped like pk.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    fdt = pk.dtype.type
    shape = pk.shape
    n = int(np.prod(shape))
    lanes = 128
    pad = (-n) % lanes
    rows = (n + pad) // lanes

    def flat(a, fill):
        a = a.reshape(-1)
        if pad:
            a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
        return a.reshape(rows, lanes)

    s = state.reshape(n, 4)
    # pad with benign values: live=0 zeroes the lanes, pk=1 keeps log finite
    args = [flat(s[:, i], 1) for i in range(4)] + [
        flat(pk, 1.0),
        flat(live, 0.0),
    ]

    block_rows = min(rows, max(8, 512 * 1024 // (lanes * 4)))
    while rows % block_rows:
        block_rows -= 1
    grid = (rows // block_rows,)
    bspec = pl.BlockSpec((block_rows, lanes), lambda i: (i, 0))

    re, im = pl.pallas_call(
        partial(_kernel, fixed_power=fixed_power, fdt=fdt),
        out_shape=(
            jax.ShapeDtypeStruct((rows, lanes), pk.dtype),
            jax.ShapeDtypeStruct((rows, lanes), pk.dtype),
        ),
        grid=grid,
        in_specs=[bspec] * 6,
        out_specs=(bspec, bspec),
        interpret=interpret,
    )(*args)
    re = re.reshape(-1)[:n].reshape(shape)
    im = im.reshape(-1)[:n].reshape(shape)
    return re, im
