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

  inputs : the per-mode RNG state at the mode's FIRST draw (4 u32
           planes; the affine jump tables are pre-bumped by one LCG step,
           pcg.prebump_axis_tables), P(k) per mode, and the zero-rule mask
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


def _b2u(cond):
    """bool -> u32 {0,1} without a cast op (Mosaic-safe)."""
    return jnp.where(cond, _U32(1), _U32(0))


def _u32_to_f(v, fdt):
    """u32 -> float, Mosaic-safe: Mosaic has no u32->f32 convert, so split
    into 16-bit halves (bitcast to i32 is free, i32->f convert exists);
    hi*65536 is exact and the single add rounds once -- identical to a
    correctly-rounded direct conversion."""
    import jax.lax as lax

    hi = lax.bitcast_convert_type(v >> _U32(16), jnp.int32)
    lo = lax.bitcast_convert_type(v & _U32(0xFFFF), jnp.int32)
    return hi.astype(fdt) * fdt(65536.0) + lo.astype(fdt)

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
    c1 = _b2u(mid < albh)  # wrapped?
    t = albl >> _U32(16)
    mid2 = mid + t
    c2 = _b2u(mid2 < mid)
    return ahbh + (mid2 >> _U32(16)) + ((c1 + c2) << _U32(16))


def _addc(a, b, cin):
    """u32 add with carry-in; returns (sum, carry_out)."""
    s1 = a + b
    c1 = _b2u(s1 < a)
    s2 = s1 + cin
    c2 = _b2u(s2 < s1)
    return s2, c1 + c2


def _bump(s0, s1, s2, s3):
    """One pcg64 LCG step (s*MULT + INC mod 2^128) in u32 limbs."""
    if _madd16_on():
        return _madd128_cols16(
            tuple(int(m) for m in _MULT), (s0, s1, s2, s3),
            tuple(int(i) for i in _INC),
        )
    m0, m1, m2, m3 = (_U32(m) for m in _MULT)
    i0, i1, i2, i3 = (_U32(i) for i in _INC)

    # column products: result limb k = sum_{i+j=k} (lo of si*mj)
    #                + sum_{i+j=k-1} (hi of si*mj) + carries + INC
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
    nz = r32 != _U32(0)
    lo = (lo1 >> r32) | jnp.where(nz, hi1 << inv, _U32(0))
    hi = (hi1 >> r32) | jnp.where(nz, lo1 << inv, _U32(0))
    return lo, hi


def _uniform(lo, hi, fdt):
    """(hi:lo)+1 scaled by 2^-64 -> (0, 1], reference rounding semantics."""
    lo1 = lo + _U32(1)
    hi1 = hi + _b2u(lo1 == _U32(0))
    allones = (lo == _U32(0xFFFFFFFF)) & (hi == _U32(0xFFFFFFFF))
    v = _u32_to_f(hi1, fdt) * fdt(2.0**-32) + _u32_to_f(lo1, fdt) * fdt(
        2.0**-64
    )
    return jnp.where(allones, fdt(1.0), v)


def _madd16_on() -> bool:
    """Trace-time gate for the 16-bit-column madd form (ZT_MADD16)."""
    import os

    return os.environ.get("ZT_MADD16", "0") != "0"


def _u16_pieces(t):
    """u32 limb 4-tuple -> 8 base-2^16 pieces (u32-held); ints stay ints."""
    out = []
    for limb in t:
        if isinstance(limb, int):
            out += [_U32(limb & 0xFFFF), _U32(limb >> 16)]
        else:
            out += [limb & _U32(0xFFFF), limb >> _U32(16)]
    return out


def _madd128_cols16(m, s, c):
    """(m*s + c) mod 2^128 in 16-bit column form (ZT_MADD16).

    Every 16x16 product is exact in ONE u32 multiply; product halves and
    the addend's pieces are binned per 16-bit output column (at most 17
    summands < 2^16, so bins stay < 2^21 and need no compare-based
    carries anywhere), then a single carry sweep re-packs the eight
    columns into four u32 limbs.  36 multiplies and zero selects vs the
    u32 form's 50 (each _mul32_hi is 4) and ~20 compare/selects.
    Bit-exact with _madd128 (tests/test_modes.py gate A/B).
    """
    M16, S16 = _U32(0xFFFF), _U32(16)
    A, B, C = _u16_pieces(m), _u16_pieces(s), _u16_pieces(c)
    cols = [[C[k]] for k in range(8)]
    for i in range(8):
        for j in range(8 - i):
            k = i + j
            p = A[j] * B[i]
            cols[k].append(p & M16)
            if k < 7:  # column 7's high half falls off the top (mod 2^128)
                cols[k + 1].append(p >> S16)
    carry = None
    digs = []
    for k in range(8):
        t = sum(cols[k][1:], cols[k][0])
        if carry is not None:
            t = t + carry
        digs.append(t & M16)
        carry = t >> S16
    return tuple(digs[2 * w] | (digs[2 * w + 1] << S16) for w in range(4))


def _madd128(m, s, c):
    """(m * s + c) mod 2^128 over u32 limb 4-tuples (elementwise)."""
    if _madd16_on():
        return _madd128_cols16(m, s, c)
    prods = {}
    for i in range(4):
        for j in range(4 - i):
            prods[(i, j)] = (m[j] * s[i], _mul32_hi(m[j], s[i]))
    zero = jnp.zeros_like(s[0])
    r0, carry = _addc(prods[(0, 0)][0], c[0], zero)
    r1, c1 = _addc(prods[(0, 1)][0], prods[(1, 0)][0], zero)
    r1, c2 = _addc(r1, prods[(0, 0)][1], zero)
    r1, c3 = _addc(r1, c[1], carry)
    carry = c1 + c2 + c3
    r2, c1 = _addc(prods[(0, 2)][0], prods[(1, 1)][0], zero)
    r2, c2 = _addc(r2, prods[(2, 0)][0], zero)
    r2, c3 = _addc(r2, prods[(0, 1)][1], zero)
    r2, c4 = _addc(r2, prods[(1, 0)][1], zero)
    r2, c5 = _addc(r2, c[2], carry)
    carry = c1 + c2 + c3 + c4 + c5
    r3 = (
        prods[(0, 3)][0]
        + prods[(1, 2)][0]
        + prods[(2, 1)][0]
        + prods[(3, 0)][0]
        + prods[(0, 2)][1]
        + prods[(1, 1)][1]
        + prods[(2, 0)][1]
        + c[3]
        + carry
    )
    return r0, r1, r2, r3


def _draw_chain(s0, s1, s2, s3, pk, live, fixed_power, fdt):
    """Two draws -> Box-Muller -> (D_re, D_im).

    The input state IS the first draw's state (the jump tables are
    pre-bumped, pcg.prebump_axis_tables), so only the second draw costs
    a bump here.  The f32 path uses the fast draw semantics
    (pcg_device.fast_uniform_f32 / sincos_2pi, ZT_DRAW_FAST) shared with
    the XLA routes, so kernel-vs-XLA f32 outputs stay bit-identical.
    """
    from . import pcg_device

    fast = fdt == np.float32 and pcg_device.draw_fast()
    unif = (
        (lambda lo, hi: pcg_device.fast_uniform_f32(lo, hi))
        if fast
        else (lambda lo, hi: _uniform(lo, hi, fdt))
    )
    lo, hi = _xsl_rr(s0, s1, s2, s3)
    R = unif(lo, hi)
    s0, s1, s2, s3 = _bump(s0, s1, s2, s3)
    lo, hi = _xsl_rr(s0, s1, s2, s3)
    T = unif(lo, hi)

    if fixed_power:
        amp = jnp.sqrt(pk)
    else:
        amp = jnp.sqrt(-pk * jnp.log(R))
    cosv, sinv = pcg_device.sincos_2pi(T, fdt)
    return live * amp * cosv, live * amp * sinv


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

    state: tuple of 4 u32 limb planes -- RNG state at the mode's FIRST
           draw (the jump map applied to the plane state; the tables
           carry the first LCG bump)
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

    # pad with benign values: live=0 zeroes the lanes, pk=1 keeps log finite
    args = [flat(s, 1) for s in state] + [
        flat(pk, 1.0),
        flat(live, 0.0),
    ]

    block_rows = min(rows, max(8, 512 * 1024 // (lanes * 4)))
    while rows % block_rows:
        block_rows -= 1
    grid = (rows // block_rows,)
    # Mosaic requires i32 index maps (x64 mode promotes literals to i64)
    bspec = pl.BlockSpec(
        (block_rows, lanes),
        lambda i: (jnp.asarray(i, jnp.int32), jnp.asarray(0, jnp.int32)),
    )

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


# ---------------------------------------------------------------------------
# Grid kernel: the whole per-mode chain (affine jump + draws + Box-Muller)
# fused over the half-space grid -- no XLA-side 128-bit math, no layout
# shuffles.  Used by the half-space fast path where (sz, sx) == (z, x).
# ---------------------------------------------------------------------------


def _grid_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
                 *refs, fixed_power, fdt, has_live):
    y = pl.program_id(0)
    m = (m0[...], m1[...], m2[...], m3[...])
    c = (c0[...], c1[...], c2[...], c3[...])
    plane = tuple(plane_ref[y, j] for j in range(4))
    s = _madd128(m, tuple(jnp.full_like(m[0], p) for p in plane), c)
    if has_live:
        live_ref, re_ref, im_ref = refs
        live = live_ref[0]
    else:
        re_ref, im_ref = refs
        live = fdt(1.0)  # zeroing folded into pk (sqrt(-0*log R) == 0)
    re, im = _draw_chain(*s, pk_ref[0], live, fixed_power, fdt)
    re_ref[0] = re
    im_ref[0] = im


# ---------------------------------------------------------------------------
# Fully packed kernel: draw chain + displacement fields + pm-packing fused,
# writing the half-SPECTRUM layout (narray*4, half+1, Z, X) directly.  The
# XLA pack stage it replaces (field math + _pack_fix_pad's pad/stack copies)
# measured 27 ms of the 47 ms synthesis at 512^3 on a v5e -- pure HBM
# traffic this kernel never emits.  Non-PLT only (the PLT eigenmode gather
# keeps the XLA pack path); the ky=0 self-conjugate fixup stays in XLA
# (it touches one plane and needs the full-Z reflection).
# ---------------------------------------------------------------------------


def _pack_grid_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
                      *refs, fixed_power, fdt, fund, half, ppd, zb,
                      just_density, qplt):
    if qplt:
        cx_ref, cy_ref, cz_ref, f_ref, out_ref = refs
    else:
        (out_ref,) = refs
    y = pl.program_id(0)
    zi = pl.program_id(1)

    @pl.when(y >= half)
    def _():
        # the appended y-Nyquist row: exact +0.0 (matches jnp.pad)
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(y < half)
    def _():
        m = (m0[...], m1[...], m2[...], m3[...])
        c = (c0[...], c1[...], c2[...], c3[...])
        plane = tuple(plane_ref[y, j] for j in range(4))
        s = _madd128(m, tuple(jnp.full_like(m[0], p) for p in plane), c)
        # zeroing folded into pk (sqrt(-0*log R) == 0), like the D kernel
        D_re, D_im = _draw_chain(*s, pk_ref[0], fdt(1.0), fixed_power, fdt)

        shape = D_re.shape  # (zb, X)

        def pack_into(j, Dp, Fp):
            # _pack_fix_pad's packing arithmetic, verbatim
            out_ref[j + 0, 0] = Dp[0] - Fp[1]
            out_ref[j + 1, 0] = Dp[1] + Fp[0]
            out_ref[j + 2, 0] = Dp[0] + Fp[1]
            out_ref[j + 3, 0] = Dp[1] - Fp[0]

        if just_density:
            zero = jnp.zeros(shape, fdt)
            pack_into(0, (D_re, D_im), (zero, zero))
            return

        if qplt:
            # pre-gathered PLT coefficients (modes_real.plt_coef_fields):
            # cx/cy/cz already carry evec * rescale * fund / k^2
            cx, cy, cz = cx_ref[0], cy_ref[0], cz_ref[0]
        else:
            # _finish_fields' expressions, verbatim (rescale = f = 1)
            zg = zi * zb + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            xg = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            kz = jnp.where(zg > half, zg - ppd, zg)
            kx = jnp.where(xg > half, xg - ppd, xg)
            ky = y  # scalar
            n2 = kx * kx + ky * ky + kz * kz
            k2 = n2.astype(fdt) * fdt(fund) ** 2
            ik2 = jnp.where(
                n2 == 0, fdt(0), 1.0 / jnp.where(n2 == 0, fdt(1), k2)
            )
            scale = fdt(1.0) * fdt(fund) * ik2
            cx = kx.astype(fdt) * scale
            cy = jnp.asarray(ky, jnp.int32).astype(fdt) * scale
            cz = kz.astype(fdt) * scale
        F = (-cx * D_im, cx * D_re)
        G = (-cy * D_im, cy * D_re)
        H = (-cz * D_im, cz * D_re)
        pack_into(0, (D_re, D_im), F)  # A = D + iF
        pack_into(4, G, H)             # B = G + iH
        if qplt:
            # velocity arrays (synthesize_half_pair's PLT tail, verbatim)
            fg = f_ref[0]
            zero = jnp.zeros(shape, fdt)
            Ff = (F[0] * fg, F[1] * fg)
            Gf = (G[0] * fg, G[1] * fg)
            Hf = (H[0] * fg, H[1] * fg)
            pack_into(8, (zero, zero), Ff)   # A2 = 0 + i f F
            pack_into(12, Gf, Hf)            # B2 = f G + i f H


@partial(jax.jit, static_argnames=("cfg", "fixed_power", "just_density",
                                   "interpret"))
def halfspace_pack_pallas(
    cfg, planes, mzx, czx, pk, fixed_power=False, just_density=False,
    interpret=None, plt_coefs=None,
):
    """Packed half-spectrum synthesis, fully fused on-chip.

    planes: tuple of 4 (half,) u32 per-y-plane state limbs
    mzx, czx: tuples of 4 (Z, X) u32 precomposed jump-table limbs
    pk: (half, Z, X) float -- pk_effective (zero rules folded in)
    plt_coefs: optional (cx, cy, cz, f) pre-gathered PLT coefficient
        fields (modes_real.plt_coef_fields); when given the kernel packs
        the 4-array PLT layout (displacements + velocity arrays).
    Returns (narray, 2, 2, half+1, Z, X) with the ky=0 plane RAW (the
    caller applies the self-conjugate fixup) and the Nyquist row zero.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    fdt = pk.dtype.type
    half, Z, X = pk.shape
    qplt = plt_coefs is not None
    narray = 1 if just_density else (4 if qplt else 2)
    planes = jnp.stack(list(planes), axis=-1)  # (half, 4)

    nj = narray * 4
    zb = Z
    while zb > 8 and nj * zb * X * 4 > 2 << 20:
        zb //= 2
    while Z % zb:
        zb -= 1
    grid = (half + 1, Z // zb)

    i32 = lambda v: jnp.asarray(v, jnp.int32)
    hm1 = half - 1
    # clamp: the y == half (zero-row) program must not prefetch past pk
    pkspec = pl.BlockSpec(
        (1, zb, X),
        lambda y, z: (jnp.minimum(i32(y), i32(hm1)), i32(z), i32(0)),
    )
    mspec = pl.BlockSpec((zb, X), lambda y, z: (i32(z), i32(0)))
    pspec = pl.BlockSpec(
        planes.shape,
        lambda y, z: (i32(0), i32(0)),
        memory_space=pltpu.SMEM,
    )
    ospec = pl.BlockSpec(
        (nj, 1, zb, X), lambda y, z: (i32(0), i32(y), i32(z), i32(0))
    )

    args = [planes, *mzx, *czx, pk]
    in_specs = [pspec] + [mspec] * 8 + [pkspec]
    if qplt:
        args += list(plt_coefs)
        in_specs += [pkspec] * 4  # same (1, zb, X) y-clamped blocks as pk

    out = pl.pallas_call(
        partial(
            _pack_grid_kernel,
            fixed_power=fixed_power,
            fdt=fdt,
            fund=cfg.fundamental,
            half=half,
            ppd=cfg.ppd,
            zb=zb,
            just_density=just_density,
            qplt=qplt,
        ),
        out_shape=jax.ShapeDtypeStruct((nj, half + 1, Z, X), pk.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=ospec,
        interpret=interpret,
    )(*args)
    return out.reshape(narray, 2, 2, half + 1, Z, X)


@partial(jax.jit, static_argnames=("fixed_power", "interpret"))
def halfspace_boxmuller_pallas(
    planes, mzx, czx, pk, live=None, fixed_power=False, interpret=None
):
    """D over the generated half-space, fully fused.

    planes: tuple of 4 (half,) u32 per-y-plane state limbs
    mzx, czx: tuples of 4 (Z, X) u32 precomposed jump-table limbs
    pk: (half, Z, X) float -- P(k), optionally with the zero-rule mask
        already folded in (pk = 0 zeroes the output exactly)
    live: optional explicit (half, Z, X) zero mask
    Returns (D_re, D_im) of shape (half, Z, X).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    fdt = pk.dtype.type
    half, Z, X = pk.shape
    planes = jnp.stack(list(planes), axis=-1)  # (half, 4): tiny, SMEM-bound

    # block over z to bound VMEM: budget ~2 MB for the biggest operand set
    zb = Z
    while zb > 8 and zb * X * 4 * 10 > 4 << 20:
        zb //= 2
    while Z % zb:
        zb -= 1
    grid = (half, Z // zb)

    # Mosaic requires i32 index maps; under x64 literals/arithmetic can
    # promote to i64, so cast every component explicitly
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    tile3 = pl.BlockSpec((1, zb, X), lambda y, z: (i32(y), i32(z), i32(0)))
    # limb tables as separate clean 2-D tiles (a trailing dim of 4 forces
    # pathological (.., 4) vector layouts in Mosaic)
    mspec = pl.BlockSpec((zb, X), lambda y, z: (i32(z), i32(0)))
    # whole planes table in SMEM (tiny); indexed by program_id in-kernel.
    # NB: an explicit i32 index map -- the default one emits i64 zeros under
    # x64, which Mosaic refuses to legalize.
    pspec = pl.BlockSpec(
        planes.shape,
        lambda y, z: (i32(0), i32(0)),
        memory_space=pltpu.SMEM,
    )

    args = [planes, *mzx, *czx, pk]
    in_specs = [pspec] + [mspec] * 8 + [tile3]
    if live is not None:
        args.append(live)
        in_specs.append(tile3)
    re, im = pl.pallas_call(
        partial(
            _grid_kernel,
            fixed_power=fixed_power,
            fdt=fdt,
            has_live=live is not None,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((half, Z, X), pk.dtype),
            jax.ShapeDtypeStruct((half, Z, X), pk.dtype),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=(tile3, tile3),
        interpret=interpret,
    )(*args)
    return re, im


# ---------------------------------------------------------------------------
# Mega kernel: draw chain + field math + pm-packing + ky=0 self-conjugate
# fixup + BOTH in-plane folded DFTs, one HBM write for the whole k-side of
# the half-spectrum step.  Composes _pack_grid_kernel's synthesis body with
# pallas_fft's folded transform; the spectrum array (2.2 GB at 512^3) never
# exists in HBM untransformed.  Opt-in via ZT_PALLAS_MEGA=1 until validated
# on hardware (kept off the default route so a Mosaic regression cannot
# break the known-good kernel pipeline).
# ---------------------------------------------------------------------------


def _reflect2d(p, interp):
    """p[(n-z) % n, (n-x) % n] in VMEM (modes_fast._reflect_zx)."""
    if interp:
        for ax in (0, 1):
            p = jnp.roll(jnp.flip(p, axis=ax), 1, axis=ax)
        return p
    from .pallas_fft import _rev_lanes, _rev_rows, _xpass_mode

    p = pltpu.roll(_rev_rows(p, interp), jnp.int32(1), 0)
    if _xpass_mode() == "lane":
        p = pltpu.roll(_rev_lanes(p, interp), jnp.int32(1), 1)
    else:
        p = pltpu.roll(_rev_rows(p.T, interp).T, jnp.int32(1), 1)
    return p


def _row_draws(plane_ref, m, c, pk, yd, fixed_power, fdt):
    """Draw chain for one grid row: affine jump + two draws + Box-Muller."""
    plane = tuple(plane_ref[yd, j] for j in range(4))
    s = _madd128(m, tuple(jnp.full_like(m[0], p) for p in plane), c)
    return _draw_chain(*s, pk, fdt(1.0), fixed_power, fdt)


def _row_pack(D_re, D_im, y, coefs, *, fund, half, ppd, just_density,
              qplt, fdt):
    """Packing for one row: deviates -> list of (sp, sm) plane pairs.

    `coefs` is (cx, cy, cz, f) pre-gathered PLT planes when qplt, else
    None (the displacement coefficients are computed from the row index).
    """
    shape = D_re.shape  # (Z, X)
    zg = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    kz = jnp.where(zg > half, zg - ppd, zg)
    kx = jnp.where(xg > half, xg - ppd, xg)
    ky = y

    def packings(Dp, Fp):
        # _pack_pm's expressions, verbatim
        return (
            (Dp[0] - Fp[1], Dp[1] + Fp[0]),  # sp = D + iF
            (Dp[0] + Fp[1], Dp[1] - Fp[0]),  # sm = D - iF
        )

    if just_density:
        zero = jnp.zeros(shape, fdt)
        return [packings((D_re, D_im), (zero, zero))]
    if qplt:
        # pre-gathered coefficients (modes_real.plt_coef_fields)
        cx, cy, cz, fg = coefs
    else:
        # _finish_fields' expressions (rescale = f = 1)
        n2 = kx * kx + ky * ky + kz * kz
        k2 = n2.astype(fdt) * fdt(fund) ** 2
        ik2 = jnp.where(
            n2 == 0, fdt(0), 1.0 / jnp.where(n2 == 0, fdt(1), k2)
        )
        scale = fdt(1.0) * fdt(fund) * ik2
        cx = kx.astype(fdt) * scale
        cy = jnp.asarray(ky, jnp.int32).astype(fdt) * scale
        cz = kz.astype(fdt) * scale
    F = (-cx * D_im, cx * D_re)
    G = (-cy * D_im, cy * D_re)
    H = (-cz * D_im, cz * D_re)
    arrays = [
        packings((D_re, D_im), F),   # A = D + iF
        packings(G, H),              # B = G + iH
    ]
    if qplt:
        zero = jnp.zeros(shape, fdt)
        Ff = (F[0] * fg, F[1] * fg)
        Gf = (G[0] * fg, G[1] * fg)
        Hf = (H[0] * fg, H[1] * fg)
        arrays += [
            packings((zero, zero), Ff),  # A2 = 0 + i f F
            packings(Gf, Hf),            # B2 = f G + i f H
        ]
    return arrays


def _row_fix(arrays, half, fdt, interp):
    """_fix_ky0_packed's expressions on the resident ky=0 plane."""
    shape = arrays[0][0][0].shape
    zg = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    xg = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    fixm = (zg > half) | ((zg == 0) & (xg > half))
    orig = (zg == 0) & (xg == 0)
    zero = jnp.zeros((), fdt)

    def fixed0(a, o):
        p_re = jnp.where(fixm, _reflect2d(o[0], interp), a[0])
        p_im = jnp.where(fixm, -_reflect2d(o[1], interp), a[1])
        return (
            jnp.where(orig, zero, p_re),
            jnp.where(orig, zero, p_im),
        )

    return [(fixed0(sp, sm), fixed0(sm, sp)) for sp, sm in arrays]


def _row_dots(arrays, Cc, Ss, alt, out_ref, *, fdt, prec, interp, row=0):
    """Folded in-plane (z, x) DFTs of every packed pair -> out planes.

    `row` selects the y-row within the out block (the paired kernel's
    out blocks carry g rows; the serial/pipe forms carry 1).
    """
    from .pallas_fft import _folded_axis0, _folded_xpass

    sg = fdt(1.0)  # inverse (FFTW +1) convention
    for a, (sp, sm) in enumerate(arrays):
        for pm, (re, im) in enumerate((sp, sm)):
            re, im = _folded_axis0(re, im, Cc, Ss, alt, sg, prec, interp)
            re, im = _folded_xpass(re, im, Cc, Ss, alt, sg, prec, interp)
            j = (a * 2 + pm) * 2
            out_ref[j + 0, row] = re
            out_ref[j + 1, row] = im


def _pack_zx_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
                    *refs, fixed_power, fdt,
                    fund, half, ppd, just_density, qplt, prec, interp):
    if qplt:
        cx_ref, cy_ref, cz_ref, f_ref = refs[:4]
        refs = refs[4:]
    cc_ref, ss_ref, alt_ref, out_ref = refs
    y = pl.program_id(0)

    @pl.when(y >= half)
    def _():
        # the appended y-Nyquist row: exact +0.0
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(do_fix):
        m = (m0[...], m1[...], m2[...], m3[...])
        c = (c0[...], c1[...], c2[...], c3[...])
        D_re, D_im = _row_draws(plane_ref, m, c, pk_ref[0], y,
                                fixed_power, fdt)
        coefs = (
            (cx_ref[0], cy_ref[0], cz_ref[0], f_ref[0]) if qplt else None
        )
        arrays = _row_pack(D_re, D_im, y, coefs, fund=fund, half=half,
                           ppd=ppd, just_density=just_density, qplt=qplt,
                           fdt=fdt)
        if do_fix:
            arrays = _row_fix(arrays, half, fdt, interp)
        Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
        _row_dots(arrays, Cc, Ss, alt, out_ref, fdt=fdt, prec=prec,
                  interp=interp)

    @pl.when(y == 0)
    def _():
        body(do_fix=True)

    @pl.when((y > 0) & (y < half))
    def _():
        body(do_fix=False)


def _pack_zx_pipe_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
                         *refs, fixed_power, fdt,
                         fund, half, ppd, just_density, qplt, prec, interp):
    """Software-pipelined mega kernel: draw row i, dot row i - 1.

    The serial form pays ~12 ms of VPU draw-chain work plus ~12 ms of
    MXU folded-DFT work per 512^3 step back-to-back, because the dots
    consume the draws of the SAME grid row.  Staging the deviates
    through a VMEM ping/pong pair decouples them: at grid step i the
    body draws row i (VPU) and dots row i-1 from the opposite buffer
    (MXU) -- two statically independent instruction streams the
    scheduler may interleave.  Parity: identical math per row, one extra
    grid step; gated by ZT_MEGA_PIPE (measured A/B in runs/).

    Edges: step 0 dots an uninitialized buffer into out row 0, which is
    rewritten at step 1 (same out block, flushed only after its last
    visit); step 1 re-dots row 0 with the ky=0 fixup (one duplicated
    row of MXU work); step half+1 overwrites the appended y-Nyquist row
    with exact +0.0.
    """
    if qplt:
        cx_ref, cy_ref, cz_ref, f_ref = refs[:4]
        refs = refs[4:]
    (cc_ref, ss_ref, alt_ref, out_ref,
     ar_ref, ai_ref, br_ref, bi_ref) = refs
    i = pl.program_id(0)
    yd = jnp.minimum(i, half - 1)  # draw row (clamped tail recompute)
    yo = i - 1                     # dot/output row

    def coefs_row():
        return (
            (cx_ref[0], cy_ref[0], cz_ref[0], f_ref[0]) if qplt else None
        )

    def phase(dst, src):
        # one straight-line region: draws(row i) -> dst, dots(src=row
        # i-1) -> out.  dst and src are distinct refs, so the two
        # streams share no memory dependence.
        m = (m0[...], m1[...], m2[...], m3[...])
        c = (c0[...], c1[...], c2[...], c3[...])
        D_re, D_im = _row_draws(plane_ref, m, c, pk_ref[0], yd,
                                fixed_power, fdt)
        dst[0][...] = D_re
        dst[1][...] = D_im
        arrays = _row_pack(src[0][...], src[1][...], yo, coefs_row(),
                           fund=fund, half=half, ppd=ppd,
                           just_density=just_density, qplt=qplt, fdt=fdt)
        Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
        _row_dots(arrays, Cc, Ss, alt, out_ref, fdt=fdt, prec=prec,
                  interp=interp)

    A = (ar_ref, ai_ref)
    B = (br_ref, bi_ref)

    @pl.when((i & 1) == 0)
    def _():
        phase(A, B)

    @pl.when((i & 1) == 1)
    def _():
        phase(B, A)

    @pl.when(i == 1)
    def _():
        # redo row 0 with the ky=0 self-conjugate fixup (overwrites the
        # plain-dot result written by phase() this step)
        arrays = _row_pack(ar_ref[...], ai_ref[...], 0, coefs_row(),
                           fund=fund, half=half, ppd=ppd,
                           just_density=just_density, qplt=qplt, fdt=fdt)
        arrays = _row_fix(arrays, half, fdt, interp)
        Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
        _row_dots(arrays, Cc, Ss, alt, out_ref, fdt=fdt, prec=prec,
                  interp=interp)

    @pl.when(i == half + 1)
    def _():
        # the appended y-Nyquist row: exact +0.0
        out_ref[...] = jnp.zeros_like(out_ref)


def _mega_pipe_on() -> bool:
    """ZT_MEGA_PIPE=1 selects the software-pipelined mega kernel.  Read
    at trace time like the other ZT_* kernel knobs; A/B runs use
    separate processes."""
    import os

    return os.environ.get("ZT_MEGA_PIPE") == "1"


def _mega_pair_g():
    """ZT_MEGA_PAIR=g: g rows per grid step in ONE straight-line body.

    Row r+1's draw chain is statically independent of row r's folded
    dots, so Mosaic's scheduler can hide VPU draws under MXU dots
    (scripts/overlap_probe.py measured 81% overlap for independent
    streams in one body; the scratch-staged ZT_MEGA_PIPE form defeated
    it, runs/pipe_r5.log).  No VMEM scratch: the deviates stay SSA
    values.  The out block carries g rows, so VMEM grows ~g-fold on
    the output window.  Unset = auto (shape-gated g=2, measured 36.3
    -> 30.9 ms at 512^3 non-PLT, runs/pair_r5.log); 0 disables."""
    import os

    v = os.environ.get("ZT_MEGA_PAIR")
    if v is None:
        return None  # auto: the caller applies the VMEM shape gate
    try:
        g = int(v)
    except ValueError:
        return 0
    return g if g >= 2 else 0


def _pack_zx_pair_kernel(plane_ref, m0, m1, m2, m3, c0, c1, c2, c3, pk_ref,
                         *refs, g, fixed_power, fdt,
                         fund, half, ppd, just_density, qplt, prec, interp):
    """g-rows-per-step mega kernel: draws of all g rows first, then dots.

    The dots of row y0+r depend only on that row's deviates, so during
    row r's dots the scheduler is free to issue rows r+1..g-1's draw
    instructions (and vice versa) -- the probe-faithful overlap
    structure.  Emits NO y-Nyquist row: out has `half` rows and the c2r
    consumer drops the (zero) Nyquist contribution analytically
    (pallas_fft._c2r_math has_nyq=False).
    """
    if qplt:
        cx_ref, cy_ref, cz_ref, f_ref = refs[:4]
        refs = refs[4:]
    cc_ref, ss_ref, alt_ref, out_ref = refs
    p = pl.program_id(0)
    y0 = g * p

    def body(do_fix):
        m = (m0[...], m1[...], m2[...], m3[...])
        c = (c0[...], c1[...], c2[...], c3[...])
        draws = [
            _row_draws(plane_ref, m, c, pk_ref[r], y0 + r,
                       fixed_power, fdt)
            for r in range(g)
        ]
        Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
        for r, (D_re, D_im) in enumerate(draws):
            coefs = (
                (cx_ref[r], cy_ref[r], cz_ref[r], f_ref[r])
                if qplt else None
            )
            arrays = _row_pack(D_re, D_im, y0 + r, coefs, fund=fund,
                               half=half, ppd=ppd,
                               just_density=just_density, qplt=qplt,
                               fdt=fdt)
            if do_fix and r == 0:
                arrays = _row_fix(arrays, half, fdt, interp)
            _row_dots(arrays, Cc, Ss, alt, out_ref, fdt=fdt, prec=prec,
                      interp=interp, row=r)

    @pl.when(p == 0)
    def _():
        body(do_fix=True)

    @pl.when(p > 0)
    def _():
        body(do_fix=False)


@partial(jax.jit, static_argnames=("cfg", "fixed_power", "just_density",
                                   "interpret"))
def halfspace_pack_zx_pallas(
    cfg, planes, mzx, czx, pk, fixed_power=False, just_density=False,
    interpret=None, plt_coefs=None,
):
    """Fused synthesis + packing + ky=0 fixup + in-plane (z, x) DFTs.

    Same inputs as halfspace_pack_pallas (incl. optional PLT coefficient
    planes); returns the TRANSFORMED half-spectrum
    (narray, 2, 2, half+1, Z, X) -- i.e. what
    zx_folded_pallas(_fix_ky0_packed(pack(...))) produces -- ready for
    the c2r y-transform.  Tolerance-equal (not bit-equal) to that
    composition: folding changes the contraction order at the ulp level.

    Under ZT_MEGA_PAIR=g the ky extent is `half` (the always-zero
    y-Nyquist row is omitted; c2r_y_folded_pallas detects the even
    extent and drops the contribution analytically).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    from .pallas_fft import _fold_mats

    fdt = pk.dtype.type
    half, Z, X = pk.shape
    qplt = plt_coefs is not None
    narray = 1 if just_density else (4 if qplt else 2)
    planes = jnp.stack(list(planes), axis=-1)  # (half, 4)
    Cc, Ss, alt = (jnp.asarray(m) for m in _fold_mats(Z))
    from .pallas_fft import _pallas_precision

    prec = _pallas_precision()

    nj = narray * 4
    pipe = _mega_pipe_on()
    pair = 0 if pipe else _mega_pair_g()
    if pair is None:
        # auto: on where the doubled out window leaves VMEM headroom
        # and the form is on-chip-validated (non-PLT/density; PLT's
        # nj = 16 out window presses the 110 MB limit at 512^3 -- opt
        # in explicitly to measure it).  Real lowering only: interpret
        # mode keeps the serial default so CPU parity oracles retain
        # the h+1 reference shape (the pair form is covered there by
        # the explicit-knob tests).
        pair = 2 if (
            not interpret and not qplt
            and nj * 2 * Z * X * 4 * 2 <= 40 * 2**20
        ) else 0
    if pair and half % pair:
        pair = 0
    if pair:
        grid = (half // pair,)
    else:
        grid = (half + 2,) if pipe else (half + 1,)

    i32 = lambda v: jnp.asarray(v, jnp.int32)
    hm1 = half - 1
    if pair:
        pkspec = pl.BlockSpec(
            (pair, Z, X), lambda y: (i32(y), i32(0), i32(0))
        )
        coefspec = pkspec
    else:
        pkspec = pl.BlockSpec(
            (1, Z, X),
            lambda y: (jnp.minimum(i32(y), i32(hm1)), i32(0), i32(0)),
        )
        # dot-phase blocks lag the grid by one step in the pipelined form
        coefspec = pl.BlockSpec(
            (1, Z, X),
            (lambda y: (jnp.clip(i32(y) - 1, i32(0), i32(hm1)), i32(0),
                        i32(0)))
            if pipe else
            (lambda y: (jnp.minimum(i32(y), i32(hm1)), i32(0), i32(0))),
        )
    mspec = pl.BlockSpec((Z, X), lambda y: (i32(0), i32(0)))
    pspec = pl.BlockSpec(
        planes.shape, lambda y: (i32(0), i32(0)), memory_space=pltpu.SMEM
    )
    matspec = lambda shp: pl.BlockSpec(
        shp, lambda y: tuple(i32(0) for _ in shp)
    )
    if pair:
        nyrows = half  # Nyquist-free form; the c2r consumer drops it
        ospec = pl.BlockSpec(
            (nj, pair, Z, X), lambda y: (i32(0), i32(y), i32(0), i32(0))
        )
        oblock = (nj, pair, Z, X)
    else:
        nyrows = half + 1
        ospec = pl.BlockSpec(
            (nj, 1, Z, X),
            (lambda y: (i32(0), jnp.clip(i32(y) - 1, i32(0), i32(half)),
                        i32(0), i32(0)))
            if pipe else
            (lambda y: (i32(0), i32(y), i32(0), i32(0))),
        )
        oblock = (nj, 1, Z, X)

    from .pallas_fft import _assert_mosaic_blocks

    _assert_mosaic_blocks(
        ((pair or 1, Z, X), (half, Z, X)),
        (oblock, (nj, nyrows, Z, X)),
    )
    args = [planes, *mzx, *czx, pk]
    in_specs = [pspec] + [mspec] * 8 + [pkspec]
    if qplt:
        args += list(plt_coefs)
        in_specs += [coefspec] * 4  # y-clamped (1, Z, X) blocks like pk
    args += [Cc, Ss, alt]
    in_specs += [matspec(Cc.shape), matspec(Ss.shape), matspec(alt.shape)]
    kern = (
        partial(_pack_zx_pair_kernel, g=pair) if pair
        else (_pack_zx_pipe_kernel if pipe else _pack_zx_kernel)
    )
    out = pl.pallas_call(
        partial(
            kern,
            fixed_power=fixed_power,
            fdt=fdt,
            fund=cfg.fundamental,
            half=half,
            ppd=cfg.ppd,
            just_density=just_density,
            qplt=qplt,
            prec=prec,
            interp=interpret,
        ),
        out_shape=jax.ShapeDtypeStruct((nj, nyrows, Z, X), pk.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=ospec,
        scratch_shapes=(
            [pltpu.VMEM((Z, X), pk.dtype)] * 4 if pipe else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return out.reshape(narray, 2, 2, nyrows, Z, X)
