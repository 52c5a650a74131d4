"""Folded dense-DFT Pallas kernels: 3x fewer MXU MACs per complex axis.

The dense complex DFT matmul (ops/mmfft) spends 3 n^2 real MACs per
skewer (Gauss form).  The cos/sin matrices have even/odd symmetry in both
indices: folding the data (e[j] = f[j] + f[n-j], o[j] = f[j] - f[n-j])
turns each n x n contraction into cos/sin half-matrices of (h+1) x h,
h = n/2 -- 4 matmuls of ~n^2/4 MACs per complex axis, i.e. 3x fewer MXU
flops.  In XLA the fold/unfold costs ~2 extra full-array HBM passes per
axis, which eats the win; fused in VMEM the folds are free.

One grid step processes one (n, n) plane pair (re, im) and applies BOTH
the z-axis (sublane) and x-axis (lane) folded transforms -- the full
in-plane part of the 3-D transform in a single HBM read + write.

Accuracy: folding sums value pairs before the product; the contraction
length halves, so the compiled result differs from the unfolded XLA
matmul at the ulp level (not bit-equal).  TPU-only, like the fused
synth+pack kernel: CPU keeps the XLA forms and their byte-equality
invariants.  Reference convention (unnormalized, sign=+1 inverse) as
ops/mmfft: zeldovich.cpp:83-135, README.md:127-129.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pallas_precision():
    """The ZT_FFT_PRECISION knob, in a form Mosaic can lower.

    Mosaic's dot_general supports DEFAULT and HIGHEST only; HIGH (the
    3-pass bf16 mode XLA uses outside kernels) is realized in-kernel by
    _kdot as an explicit hi/lo bf16 operand split -- the sentinel
    "bf16x3" selects it.  DEFAULT and HIGHEST pass through.
    """
    from jax import lax

    from .mmfft import _resolve_precision

    p = _resolve_precision(None)
    return "bf16x3" if p == lax.Precision.HIGH else p


def _kdot(M, x, prec, dims=(((1,), (0,)), ((), ()))):
    """lax.dot_general honoring the precision knob inside a Mosaic kernel.

    "bf16x3" is XLA's Precision.HIGH (3 bf16 MXU passes) written out by
    hand, since Mosaic only lowers DEFAULT and HIGHEST: split each f32
    operand into a bf16 high part and a bf16 residual, accumulate the
    three significant cross products in f32, and drop lo*lo (~2^-18
    relative -- the same arithmetic XLA emits for HIGH).  Halves the MXU
    passes vs HIGHEST at ~18-bit effective mantissa; the measured
    displacement error of the full step is in scripts/measure_precision
    runs (README precision ladder).
    """
    d = partial(lax.dot_general, dimension_numbers=dims,
                preferred_element_type=jnp.float32)
    if prec != "bf16x3":
        return d(M, x, precision=prec)
    d = partial(d, precision=lax.Precision.DEFAULT)
    Mh = M.astype(jnp.bfloat16)
    xh = x.astype(jnp.bfloat16)
    Ml = (M - Mh.astype(jnp.float32)).astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return d(Mh, xh) + (d(Mh, xl) + d(Ml, xh))


@lru_cache(maxsize=None)
def _fold_mats(n: int):
    """Host cos/sin half-matrices (f32) for the folded length-n DFT.

    Cc[k, j] = cos(2 pi k j / n),  k in [0, h], j in [0, h-1]
    Ss[k, j] = sin(2 pi k j / n),  same shape (column 0 is zero, row 0/h
    zero); alt[k] = cos(pi k) = (-1)^k carries the j = h Nyquist column.
    """
    h = n // 2
    k = np.arange(h + 1)[:, None].astype(np.float64)
    j = np.arange(h)[None, :].astype(np.float64)
    ang = 2.0 * np.pi / n * (k * j)
    Cc = np.cos(ang).astype(np.float32)
    Ss = np.sin(ang).astype(np.float32)
    alt = np.cos(np.pi * np.arange(h + 1)).astype(np.float32)[:, None]
    return Cc, Ss, alt


def _rev_rows(x, interp):
    """Reverse the (power-of-two) sublane axis of (m, X).

    Mosaic has no rev primitive; a log2(m) butterfly of masked circular
    shifts (swap halves, then quarters, ...) is an exact permutation --
    bit-identical to lax.rev, which the interpreter uses directly.
    """
    if interp:
        return lax.rev(x, (0,))
    m = x.shape[0]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, 0)
    b = m
    while b >= 2:
        s = b // 2
        # i32 shifts: python ints promote to i64 under x64, which the
        # tpu.dynamic_rotate op refuses
        fwd = pltpu.roll(x, jnp.int32(m - s), 0)  # fwd[p] = x[p + s]
        bwd = pltpu.roll(x, jnp.int32(s), 0)      # bwd[p] = x[p - s]
        # idx % b as same-dtype bitwise ops: mixed-type % recurses in the
        # x64 promotion path at trace time
        in_first = (idx & jnp.int32(b - 1)) < jnp.int32(s)
        x = jnp.where(in_first, fwd, bwd)
        b = s
    return x


def _rev_lanes(x, interp):
    """Reverse the (power-of-two) lane axis of (R, n) -- the lane twin of
    _rev_rows, same masked-circular-shift butterfly."""
    if interp:
        return lax.rev(x, (1,))
    n = x.shape[1]
    idx = lax.broadcasted_iota(jnp.int32, x.shape, 1)
    b = n
    while b >= 2:
        s = b // 2
        fwd = pltpu.roll(x, jnp.int32(n - s), 1)
        bwd = pltpu.roll(x, jnp.int32(s), 1)
        in_first = (idx & jnp.int32(b - 1)) < jnp.int32(s)
        x = jnp.where(in_first, fwd, bwd)
        b = s
    return x


def _xpass_mode() -> str:
    """Orientation of the lane-axis (x) folded pass: ZT_ZX_XPASS.

    "transpose" (default): transpose in VMEM and contract sublanes via
    _folded_axis0 -- dot dims ((1,),(0,)), the MXU's native orientation.
    "lane": contract the lane axis directly via _folded_axis1 -- no VMEM
    transposes, but the ((1,),(1,)) contraction forces an A.B^T MXU
    orientation that measured ~2x slower per x-pass on a v5e at 512^3
    (zx 11.9 -> 23.8 ms, runs/ab_xpass_r5.log), which is why transpose
    is the default.  Read at trace time like the other ZT_* kernel
    knobs; A/B runs use separate processes.
    """
    import os

    return os.environ.get("ZT_ZX_XPASS", "transpose")


def _folded_xpass(re, im, Cc, Ss, alt, sg, prec, interp):
    """The x-axis (lane) folded DFT of an (R, n) pair, orientation gated
    by ZT_ZX_XPASS (see _xpass_mode)."""
    if _xpass_mode() == "lane":
        return _folded_axis1(re, im, Cc, Ss, sg, prec, interp)
    r, i = _folded_axis0(re.T, im.T, Cc, Ss, alt, sg, prec, interp)
    return r.T, i.T


def _folded_axis1(re, im, Cc, Ss, sg, prec, interp):
    """Complex folded DFT contracting the LAST (lane) axis of (R, n).

    The lane twin of _folded_axis0: contraction dims ((1,),(1,)) keep the
    data in its natural orientation, so the x-axis pass of a (z, x) plane
    needs no VMEM transposes (the transpose form costs 4 per plane pair).
    Fold/mirror reversals ride half-extent lane-roll butterflies; the
    head/Nyquist columns and the k = h output column are handled
    arithmetically (an (-1)^j lane reduction and an iota-built (-1)^k
    row) instead of the unaligned 1-wide lane concats Mosaic relayouts
    poorly.  Same math/convention as _folded_axis0 -- but NOT the same
    speed: the lane contraction's A.B^T orientation measured ~2x the
    transpose form's x-pass time on a v5e (see _xpass_mode), so this
    form is opt-in.
    """
    n = re.shape[1]
    h = n // 2
    R = re.shape[0]
    dotT = partial(_kdot, prec=prec, dims=(((1,), (1,)), ((), ())))

    x2 = jnp.concatenate([re, im], axis=0)  # (2R, n): share the matrices
    idx = lax.broadcasted_iota(jnp.int32, x2.shape, 1)
    padh = jnp.zeros((2 * R, h), x2.dtype)

    def half_rev(v):
        # reverse an (R, h) half: 8 butterfly rounds instead of 9 full
        return lax.rev(v, (1,)) if interp else _rev_lanes(v, interp)

    def shift_right(v, s):
        # zero-padded (not circular in the consumed region) right shift
        return (
            jnp.roll(v, s, axis=1) if interp
            else pltpu.roll(v, jnp.int32(s), 1)
        )

    # r1[:, j] = x[:, n - j] for j = 1..h (col 0 lands zero -> e[0] = x0,
    # the single-count head; cos col j=0 is ones so no halving needed)
    u = half_rev(x2[:, h:])  # u[q] = x[n-1-q]
    r1 = shift_right(jnp.concatenate([u, padh], axis=1), 1)
    e_full = x2 + r1
    o_full = x2 - r1  # col 0 = x0, but sin col j=0 is zero: ignored
    eh = e_full[:, :h]
    # Rc cols 0..h-1 by the dot; col h is the (-1)^j VPU lane reduction
    # (exact f32 -- the same M-axis trick as _folded_axis0, transposed)
    sgnj = (
        1 - 2 * (lax.broadcasted_iota(jnp.int32, (1, h), 1) & 1)
    ).astype(x2.dtype)
    Rc_h = jnp.sum(eh * sgnj, axis=1, keepdims=True)  # (2R, 1)
    Rc = jnp.concatenate([dotT(eh, Cc[:h]), padh], axis=1)  # aligned h|h
    Rc = jnp.where(idx == h, Rc_h, Rc)
    # Nyquist column j = h contributes alt[k] * x[h] for k <= h
    xh = jnp.sum(jnp.where(idx == h, x2, 0), axis=1, keepdims=True)
    alt_row = jnp.where(
        idx <= h, (1 - 2 * (idx & 1)).astype(x2.dtype), x2.dtype.type(0)
    )
    Rc = Rc + alt_row * xh
    Rs = jnp.concatenate([dotT(o_full[:, :h], Ss[:h]), padh], axis=1)
    Rc_re, Rc_im = Rc[:R], Rc[R:]
    Rs_re, Rs_im = Rs[:R], Rs[R:]
    # out[k <= h] = Rc -/+ sg*Rs; out[n-k] = the mirror, sign flipped
    top2 = jnp.concatenate(
        [Rc_re - sg * Rs_im, Rc_im + sg * Rs_re], axis=0
    )  # zero beyond col h by construction
    t2 = jnp.concatenate(
        [Rc_re + sg * Rs_im, Rc_im - sg * Rs_re], axis=0
    )
    # mirror: out[:, p > h] = t[:, n - p] = t[:, h-1-q] at q = p-h-1.
    # Reverse only t's first h cols (half-extent butterfly) and shift
    # the result to cols h+1.. (the wrap lands in the masked region).
    mh = half_rev(t2[:, :h])  # mh[q] = t[h-1-q]
    m2 = shift_right(jnp.concatenate([mh, padh], axis=1), h + 1)
    out2 = top2 + jnp.where(idx > h, m2, 0)
    return out2[:R], out2[R:]


def _folded_axis0(re, im, Cc, Ss, alt, sg, prec, interp):
    """Complex folded DFT contracting the first (sublane) axis of (n, X)."""
    n = re.shape[0]
    h = n // 2
    dot = partial(_kdot, prec=prec)

    def fold(x):
        # e[j] = x[j] + x[n-j], o[j] = x[j] - x[n-j]: the reversed tail
        # x[n-1]..x[h+1] only needs the upper half reversed (8 butterfly
        # rounds on h rows instead of 9 on n -- the lower half of a full
        # reversal is never consumed)
        head = x[:1]
        mid, tail = x[1:h], _rev_rows(x[h:], interp)[: h - 1]
        e = jnp.concatenate([head, mid + tail], axis=0)
        o = jnp.concatenate([jnp.zeros_like(head), mid - tail], axis=0)
        return e, o, x[h:h + 1]

    # one reversal butterfly serves both components (split after); re/im
    # also share the DFT matrices, so one double-width dot per matrix
    # keeps the MXU weight-stationary twice as long (identical
    # per-column results)
    Xw = re.shape[1]
    e2, o2, ny2 = fold(jnp.concatenate([re, im], axis=1))
    # The MXU tiles output rows in 128s: h+1 rows (e.g. 257 at n = 512)
    # pad to h+128, wasting up to a third of the M axis.  Row h is
    # analytic -- Cc[h, j] = cos(pi j) = (-1)^j and Ss[h, :] = 0 -- so
    # the dots run with exactly h rows and row h is one cheap VPU
    # alternating-sign reduction (exact f32, more accurate than the
    # bf16x3 dot row it replaces).
    sgnj = (
        1 - 2 * (lax.broadcasted_iota(jnp.int32, (h, 1), 0) & 1)
    ).astype(e2.dtype)
    Rc_h = jnp.sum(e2 * sgnj, axis=0, keepdims=True)
    Rc = jnp.concatenate([dot(Cc[:h], e2), Rc_h], axis=0) + alt * ny2
    Rs = jnp.concatenate(
        [dot(Ss[:h], o2), jnp.zeros((1, o2.shape[1]), o2.dtype)], axis=0
    )
    Rc_re, Rc_im = Rc[:, :Xw], Rc[:, Xw:]
    Rs_re, Rs_im = Rs[:, :Xw], Rs[:, Xw:]
    # out[k<=h] = Rc -/+ sg*Rs;  out[n-k] = mirror with the sign flipped
    top_re = Rc_re - sg * Rs_im
    top_im = Rc_im + sg * Rs_re
    T2 = jnp.concatenate(
        [Rc_re + sg * Rs_im, Rc_im - sg * Rs_re], axis=1
    )
    # out[p > h] = T[n - p] = T[h-1-q] at q = p-h-1: reverse only T's
    # first h rows (half-extent butterfly, one pass for both components)
    W = _rev_rows(T2[:h], interp)[: h - 1]
    out_re = jnp.concatenate([top_re, W[:, :Xw]], axis=0)
    out_im = jnp.concatenate([top_im, W[:, Xw:]], axis=0)
    return out_re, out_im


def _zx_kernel(spm_ref, cc_ref, ss_ref, alt_ref, out_ref, *, sg, prec,
               interp):
    re = spm_ref[0, 0, 0]
    im = spm_ref[0, 1, 0]
    Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
    # z axis: contract sublanes directly
    re, im = _folded_axis0(re, im, Cc, Ss, alt, sg, prec, interp)
    # x axis: orientation gated by ZT_ZX_XPASS (transpose default)
    re, im = _folded_xpass(re, im, Cc, Ss, alt, sg, prec, interp)
    out_ref[0, 0, 0] = re
    out_ref[0, 1, 0] = im


@partial(jax.jit, static_argnames=("sign", "interpret"))
def zx_folded_pallas(spm, sign: int = +1, interpret=None):
    """In-plane (z, x) complex DFT of a stacked pair batch, folded + fused.

    spm: (..., 2, K, n, n) float32 -- (re/im, plane batch, Z, X) trailing
    dims, matching the half-spectrum layout (narray, pm, re/im, ky, Z, X)
    with no relayout: the re/im dim is carried in the block so the DMA
    gathers both components of a plane without a host-side transpose.
    Returns the same shape with both in-plane axes transformed
    (unnormalized, FFTW sign convention).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = spm.shape[-1]
    assert spm.shape[-2] == n and spm.shape[-4] == 2
    k = spm.shape[-3]
    lead = spm.shape[:-4]
    b = int(np.prod(lead)) if lead else 1
    flat = spm.reshape(b, 2, k, n, n)
    Cc, Ss, alt = (jnp.asarray(m) for m in _fold_mats(n))

    prec = _pallas_precision()
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    pspec = pl.BlockSpec(
        (1, 2, 1, n, n),
        lambda i, j: (i32(i), i32(0), i32(j), i32(0), i32(0)),
    )
    mspec = lambda shape: pl.BlockSpec(
        shape, lambda i, j: tuple(i32(0) for _ in shape)
    )
    _assert_mosaic_blocks(((1, 2, 1, n, n), flat.shape))
    out = pl.pallas_call(
        partial(_zx_kernel, sg=np.float32(sign), prec=prec,
                interp=interpret),
        out_shape=jax.ShapeDtypeStruct((b, 2, k, n, n), spm.dtype),
        grid=(b, k),
        in_specs=[pspec, mspec(Cc.shape), mspec(Ss.shape), mspec(alt.shape)],
        out_specs=pspec,
        # two (n, n) plane pairs + folded temps overflow the default 16M
        # scoped-vmem cap at n = 512; the chip has 128M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, Cc, Ss, alt)
    return out.reshape(spm.shape)


def _z_tile_kernel(spm_ref, cc_ref, ss_ref, alt_ref, out_ref, *, sg, prec,
                   interp):
    """Folded transform along z (sublanes) of one (n, w) lane tile."""
    re = spm_ref[0, 0, 0]
    im = spm_ref[0, 1, 0]
    out_ref[0, 0, 0], out_ref[0, 1, 0] = _folded_axis0(
        re, im, cc_ref[...], ss_ref[...], alt_ref[...], sg, prec, interp
    )


def _x_tile_kernel(spm_ref, cc_ref, ss_ref, alt_ref, out_ref, *, sg, prec,
                   interp):
    """Folded transform along x (lanes) of one (w, n) sublane stripe."""
    re = spm_ref[0, 0, 0]
    im = spm_ref[0, 1, 0]
    r, i = _folded_xpass(
        re, im, cc_ref[...], ss_ref[...], alt_ref[...], sg, prec, interp
    )
    out_ref[0, 0, 0], out_ref[0, 1, 0] = r, i


@partial(jax.jit, static_argnames=("sign", "tile", "interpret"))
def zx_tiled_pallas(spm, sign: int = +1, tile: int = 512, interpret=None):
    """Two-pass folded in-plane DFT for planes too big to fuse (n > 512).

    Same math and layout contract as zx_folded_pallas, but each axis is
    its own pallas_call with the other axis tiled to ``tile`` lanes, so
    the VMEM footprint is ~n*tile instead of n^2.  Costs one extra HBM
    round trip vs the fused kernel -- still 3x fewer MXU MACs than the
    unfolded XLA matmul, with the folds in VMEM.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = spm.shape[-1]
    assert spm.shape[-2] == n and spm.shape[-4] == 2
    w = min(tile, n)
    assert n % w == 0
    k = spm.shape[-3]
    lead = spm.shape[:-4]
    b = int(np.prod(lead)) if lead else 1
    flat = spm.reshape(b, 2, k, n, n)
    Cc, Ss, alt = (jnp.asarray(m) for m in _fold_mats(n))

    prec = _pallas_precision()
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    zspec = pl.BlockSpec(
        (1, 2, 1, n, w),
        lambda i, j, t: (i32(i), i32(0), i32(j), i32(0), i32(t)),
    )
    xspec = pl.BlockSpec(
        (1, 2, 1, w, n),
        lambda i, j, t: (i32(i), i32(0), i32(j), i32(t), i32(0)),
    )
    mspec = lambda shape: pl.BlockSpec(
        shape, lambda i, j, t: tuple(i32(0) for _ in shape)
    )
    _assert_mosaic_blocks(
        ((1, 2, 1, n, w), flat.shape), ((1, 2, 1, w, n), flat.shape)
    )
    mats = [mspec(Cc.shape), mspec(Ss.shape), mspec(alt.shape)]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        partial(_z_tile_kernel, sg=np.float32(sign), prec=prec,
                interp=interpret),
        out_shape=jax.ShapeDtypeStruct(flat.shape, spm.dtype),
        grid=(b, k, n // w),
        in_specs=[zspec] + mats,
        out_specs=zspec,
        compiler_params=params,
        interpret=interpret,
    )(flat, Cc, Ss, alt)
    out = pl.pallas_call(
        partial(_x_tile_kernel, sg=np.float32(sign), prec=prec,
                interp=interpret),
        out_shape=jax.ShapeDtypeStruct(flat.shape, spm.dtype),
        grid=(b, k, n // w),
        in_specs=[xspec] + mats,
        out_specs=xspec,
        compiler_params=params,
        interpret=interpret,
    )(out, Cc, Ss, alt)
    return out.reshape(spm.shape)


@partial(jax.jit, static_argnames=("sign", "tile", "interpret"))
def y_tiled_pallas(zslab, sign: int = +1, tile: int = 512, interpret=None):
    """Folded DFT along axis -3 of (..., 2, Y, Bz, X) -- the out-of-core
    middle-axis (y) transform of a staged z-slab, lane-tiled like
    zx_tiled_pallas.  Same unnormalized FFTW convention as
    mmfft.cfft_axis(..., -3, sign).

    The Bz block is 8 thick (Mosaic's sublane rule forbids a 1-thick
    block unless Bz == 1); inside the kernel the sub-planes are
    lane-concatenated into dot groups of ~tile columns.  Bz values with
    no legal blocking (not divisible by 8 and too thick to take whole),
    and shapes whose smallest legal lane tile still blows the VMEM
    budget, fall back to the XLA matmul transform.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, bz, X = zslab.shape[-3:]
    assert zslab.shape[-4] == 2
    lead = zslab.shape[:-4]
    b = int(np.prod(lead)) if lead else 1

    def xla_fallback():
        from . import mmfft

        re, im = mmfft.cfft_axis(
            zslab[..., 0, :, :, :], zslab[..., 1, :, :, :], -3, sign
        )
        return jnp.stack([re, im], axis=-4)

    if bz % 8 == 0:
        bzb = 8
    elif bz <= 8:
        bzb = bz  # whole-dim block is always legal
    else:
        return xla_fallback()
    w = _y_tile_w(n, bzb, X, tile)
    if w is None:
        return xla_fallback()  # no legal lane tile fits VMEM
    gz = max(1, tile // w)  # sub-planes per dot group (bounds VMEM temps)

    flat = zslab.reshape(b, 2, n, bz, X)
    Cc, Ss, alt = (jnp.asarray(m) for m in _fold_mats(n))

    prec = _pallas_precision()
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    yspec = pl.BlockSpec(
        (1, 2, n, bzb, w),
        lambda i, j, t: (i32(i), i32(0), i32(0), i32(j), i32(t)),
    )
    mspec = lambda shape: pl.BlockSpec(
        shape, lambda i, j, t: tuple(i32(0) for _ in shape)
    )
    _assert_mosaic_blocks(((1, 2, n, bzb, w), flat.shape))

    def kernel(ref, cc_ref, ss_ref, alt_ref, out_ref):
        Cc, Ss, alt = cc_ref[...], ss_ref[...], alt_ref[...]
        for g0 in range(0, bzb, gz):
            zis = range(g0, min(g0 + gz, bzb))
            re = jnp.concatenate([ref[0, 0, :, zi] for zi in zis], axis=1)
            im = jnp.concatenate([ref[0, 1, :, zi] for zi in zis], axis=1)
            r, i = _folded_axis0(
                re, im, Cc, Ss, alt, np.float32(sign), prec, interpret
            )
            for idx, zi in enumerate(zis):
                out_ref[0, 0, :, zi] = r[:, idx * w:(idx + 1) * w]
                out_ref[0, 1, :, zi] = i[:, idx * w:(idx + 1) * w]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(flat.shape, zslab.dtype),
        grid=(b, bz // bzb, X // w),
        in_specs=[yspec, mspec(Cc.shape), mspec(Ss.shape), mspec(alt.shape)],
        out_specs=yspec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, Cc, Ss, alt)
    return out.reshape(zslab.shape)


def _gate(dtype, n: int, lo: int, hi: int, knob: str | None = None) -> bool:
    """Shared kernel-dispatch gate: TPU backend, f32, power-of-two n in
    [lo, hi] (the reversal butterfly needs a power of two), overridable
    via ZT_NO_PALLAS_FFT (all kernels) or a kernel-specific knob.
    ZT_PALLAS_FORCE=1 waives the backend check (tests: exercises the TPU
    routing on CPU, where the kernels run in interpret mode)."""
    import os

    return (
        dtype == jnp.float32
        and (
            jax.default_backend() == "tpu"
            or os.environ.get("ZT_PALLAS_FORCE") == "1"
        )
        and not os.environ.get("ZT_NO_PALLAS_FFT")
        and not (knob and os.environ.get(knob))
        and n & (n - 1) == 0
        and lo <= n <= hi
    )


def use_y_tiled(dtype, n: int) -> bool:
    """Out-of-core y-transform kernel gate."""
    return _gate(dtype, n, 128, 2048, "ZT_NO_PALLAS_TILED")


def use_zx_tiled(dtype, n: int) -> bool:
    """Two-pass tiled kernel gate: above the fused kernel's range."""
    return _gate(dtype, n, 1024, 2048, "ZT_NO_PALLAS_TILED")


#: Per-kernel ceiling for the double-buffered in+out block windows.  The
#: chip's VMEM is 128M and the kernels request vmem_limit_bytes = 100M;
#: budgeting windows to 80M leaves ~20M for the folded-DFT temporaries.
#: NOTE: jit(...).lower() (scripts/lower_check.py) validates block-shape
#: legality but NOT VMEM fit -- that only fails at real compile, which is
#: why the tile-sizing loops budget against this constant at trace time.
_VMEM_WINDOW_BUDGET = 80 * 1024 * 1024


def _win_bytes(n: int, bzb: int, w: int) -> int:
    """Double-buffered in+out VMEM bytes of a (2, n, bzb, w) f32 window."""
    return 4 * (2 * n * bzb * w * 4)


def _y_tile_w(n: int, bzb: int, X: int, tile: int) -> int | None:
    """Lane-tile width for y_tiled_pallas, or None if nothing fits VMEM.

    Full X when it fits the dot-group AND VMEM budgets, else the largest
    128-multiple that does (w == X is always block-legal).  The VMEM
    budget must count the full Y extent (n) carried whole in every block
    (measured on a v5e: n = X = 512 fit, n = X = 1024 needed 149M of the
    128M VMEM until w was budgeted down); _VMEM_WINDOW_BUDGET leaves
    headroom for the kernel's (n, gz*w) fold temps.
    """
    w = X
    while (
        w > 128
        and w % 256 == 0
        and (bzb * w > 8 * tile or _win_bytes(n, bzb, w) > _VMEM_WINDOW_BUDGET)
    ):
        w //= 2
    if _win_bytes(n, bzb, w) > _VMEM_WINDOW_BUDGET:
        return None
    return w


def _assert_mosaic_blocks(*specs_arrays):
    """Trace-time twin of Mosaic's block-shape rule, enforced everywhere.

    Mosaic requires the last two block dims be divisible by (8, 128) or
    equal the array dims -- but only checks at REAL lowering, which the
    CPU interpret-mode tests never reach (that is exactly how an illegal
    z-block-of-1 spec shipped once).  Raising at trace time makes the
    interpret suite catch it (ValueError, not assert: the check must
    survive ``python -O``).
    """
    for bs, ars in specs_arrays:
        if ars[-1] < 128:
            # sub-lane-width arrays only occur in toy interpret-mode test
            # shapes; every production gate requires n >= 128, so skipping
            # them never hides a real-lowering shape
            continue
        if not (bs[-1] % 128 == 0 or bs[-1] == ars[-1]):
            raise ValueError(f"Mosaic-illegal lane block {bs} for {ars}")
        if len(bs) >= 2 and not (bs[-2] % 8 == 0 or bs[-2] == ars[-2]):
            raise ValueError(f"Mosaic-illegal sublane block {bs} for {ars}")


def _c2r_form() -> str:
    """Lane layout of the c2r kernel's dots: ZT_C2R_FORM.

    "concat" (default): lane-concatenate the zb z-planes x D/F stripes
    into ONE (hp1, zb*2*X) operand per matrix -- 2 dots per program, but
    ~2*hp1*W elements of VMEM concat copies in and 2*zb slice-copies out.
    "perz": one (hp1, 2*X) operand per z-plane -- 2*zb smaller dots, no
    wide concats, direct static-slice output writes.  Candidate for the
    measured VPU overhead between the c2r stage (~8.7 ms at 512^3) and
    its max(HBM, MXU) floor (~5.3 ms).
    """
    import os

    return os.environ.get("ZT_C2R_FORM", "concat")


def _c2r_math(a, b, Cm, Sm, alt, h, dot, interp, has_nyq=True):
    """P/Q/mirror of one lane-group: a, b are (h+1, W) folded operands
    (or (h, W) when has_nyq=False: a Nyquist-free producer whose ky=h
    row is zero by construction, e.g. the paired mega kernel).

    Same M-axis trick as _folded_axis0: Cm[h, k] = cos(pi k) = (-1)^k
    and Sm[h, :] = 0, so the dots run with exactly h output rows (no
    128-row padding waste) and row h is a VPU alternating reduction
    over k = 1..h-1 (iota row i == k-1, so the sign is -(-1)^i).
    Returns the full (n, W) output rows.
    """
    halfc = jnp.float32(0.5)
    am, bm = a[1:h], b[1:h]
    sgnk = (
        2 * (lax.broadcasted_iota(jnp.int32, (h - 1, 1), 0) & 1) - 1
    ).astype(am.dtype)
    P_h = jnp.sum(am * sgnk, axis=0, keepdims=True)
    P = (
        jnp.concatenate([dot(Cm[:h], am), P_h], axis=0)
        + halfc * a[0:1]
    )
    if has_nyq:
        P = P + halfc * alt * a[h:h + 1]
    Q = jnp.concatenate(
        [dot(Sm[:h], bm), jnp.zeros((1, bm.shape[1]), bm.dtype)], axis=0
    )
    top = P + Q  # y = 0..h
    T = P - Q  # out[y > h] = T[n - y] = T[h-1-q] at q = y-h-1
    return jnp.concatenate([top, _rev_rows(T[:h], interp)[: h - 1]], axis=0)


def _c2r_kernel(spm_ref, cm_ref, sm_ref, alt_ref, out_ref, *, zb, prec,
                interp, has_nyq=True):
    """Folded c2r y-transform of a zb-thick (z, x) stripe, mirror in VMEM.

    Same math as mmfft._c2r_y_pair_folded (whose XLA form loses its MAC
    saving to fold/unfold HBM passes): compute output rows y in [0, h]
    with half-length matmuls, mirror rows y > h in VMEM.  Lane grouping
    of the dots per _c2r_form; zb >= 8 keeps the block's sublane dim
    Mosaic-legal.  has_nyq=False: the ky axis carries h rows (no
    Nyquist row; it is zero by construction from the paired mega
    kernel).
    """
    Cm, Sm, alt = cm_ref[...], sm_ref[...], alt_ref[...]
    h = spm_ref.shape[3] - 1 if has_nyq else spm_ref.shape[3]
    X = spm_ref.shape[5]
    dot = partial(_kdot, prec=prec)

    if _c2r_form() == "perz":
        for zi in range(zb):
            spr = spm_ref[0, 0, 0, :, zi]
            spi = spm_ref[0, 0, 1, :, zi]
            smr = spm_ref[0, 1, 0, :, zi]
            smi = spm_ref[0, 1, 1, :, zi]
            a = jnp.concatenate([spr + smr, spi - smi], axis=1)
            b = jnp.concatenate([spi + smi, smr - spr], axis=1)
            full = _c2r_math(a, b, Cm, Sm, alt, h, dot, interp, has_nyq)
            out_ref[0, 0, :, zi] = full[:, :X]
            out_ref[0, 1, :, zi] = full[:, X:]
        return

    cols_a, cols_b = [], []
    for zi in range(zb):
        spr = spm_ref[0, 0, 0, :, zi]
        spi = spm_ref[0, 0, 1, :, zi]
        smr = spm_ref[0, 1, 0, :, zi]
        smi = spm_ref[0, 1, 1, :, zi]
        cols_a += [spr + smr, spi - smi]  # twoDr, twoFr
        cols_b += [spi + smi, smr - spr]  # twoDi, twoFi
    a = jnp.concatenate(cols_a, axis=1)
    b = jnp.concatenate(cols_b, axis=1)
    full = _c2r_math(a, b, Cm, Sm, alt, h, dot, interp, has_nyq)
    for zi in range(zb):
        out_ref[0, 0, :, zi] = full[:, (2 * zi) * X:(2 * zi + 1) * X]
        out_ref[0, 1, :, zi] = full[:, (2 * zi + 1) * X:(2 * zi + 2) * X]


@partial(jax.jit, static_argnames=("interpret",))
def c2r_y_folded_pallas(spm, interpret=None):
    """Half-spectrum inverse y-transform (mmfft.c2r_y_pair), folded + fused.

    spm: (..., 2, 2, ky, Z, X) float32 -- (+/- packing, re/im, ky, Z, X)
    with z and x already transformed.  The ky extent disambiguates by
    parity (n even => h = n/2 even, h+1 odd): ky odd is the usual h+1
    rows including the y-Nyquist row; ky even is the Nyquist-free form
    the paired mega kernel emits (the row is zero by construction, so
    its contribution is dropped analytically).  Returns
    (..., 2, n, Z, X), the packed x-space pair; unnormalized +1
    convention as c2r_y_pair.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    ky, Z, X = spm.shape[-3:]
    has_nyq = bool(ky % 2)
    hp1 = ky if has_nyq else ky + 1
    n = 2 * (hp1 - 1)
    assert spm.shape[-5:-3] == (2, 2)
    lead = spm.shape[:-5]
    b = int(np.prod(lead)) if lead else 1
    flat = spm.reshape(b, 2, 2, ky, Z, X)
    from .mmfft import _c2r_fold_mats

    Cm, Sm, alt3 = _c2r_fold_mats(n)
    alt = jnp.asarray(alt3[..., 0])  # (h+1, 1)
    Cm, Sm = jnp.asarray(Cm), jnp.asarray(Sm)
    prec = _pallas_precision()
    # z-block of 8 (Mosaic sublane rule); lane tile sized so the
    # concatenated dot width zb*2*Xb stays at 4096 -- re-measured at the
    # bf16x3 precision default: 14.8 ms at 512^3, and EVERY wider config
    # (width 8192+, zb 16) VMEM-OOMs at compile because the fold temps and
    # spill slots scale with the dot width on top of the ~67M in+out
    # windows (runs/c2r_tile_ab.log, scripts/c2r_tile_ab.sh).  The sweet
    # spot and the VMEM wall coincide here; don't widen.
    zb = 8 if Z % 8 == 0 else Z
    Xb = X
    while Xb > 128 and Xb % 256 == 0 and zb * 2 * Xb > 4096:
        Xb //= 2
    i32 = lambda v: jnp.asarray(v, jnp.int32)
    in_spec = pl.BlockSpec(
        (1, 2, 2, ky, zb, Xb),
        lambda i, j, t: (i32(i), i32(0), i32(0), i32(0), i32(j), i32(t)),
    )
    out_spec = pl.BlockSpec(
        (1, 2, n, zb, Xb),
        lambda i, j, t: (i32(i), i32(0), i32(0), i32(j), i32(t)),
    )
    mspec = lambda shape: pl.BlockSpec(
        shape, lambda i, j, t: tuple(i32(0) for _ in shape)
    )
    _assert_mosaic_blocks(
        ((1, 2, 2, ky, zb, Xb), flat.shape),
        ((1, 2, n, zb, Xb), (b, 2, n, Z, X)),
    )
    out = pl.pallas_call(
        partial(_c2r_kernel, zb=zb, prec=prec, interp=interpret,
                has_nyq=has_nyq),
        out_shape=jax.ShapeDtypeStruct((b, 2, n, Z, X), spm.dtype),
        grid=(b, Z // zb, X // Xb),
        in_specs=[in_spec, mspec(Cm.shape), mspec(Sm.shape), mspec(alt.shape)],
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(flat, Cm, Sm, alt)
    return out.reshape(*lead, 2, n, Z, X)


def use_c2r_pallas(dtype, n: int) -> bool:
    """Folded c2r y-transform kernel gate.

    Upper bound 1024: on-chip parity validated at 512 (rel 1.5e-7) and
    1024 (rel 2.0e-7, runs/r4_ab.log); above 1024 the assembled
    four-step XLA form (c2r_y_pair's n > DENSE_MAX branch) is the
    efficient route and the kernel's whole-ky window would press the
    VMEM limit.
    """
    return _gate(dtype, n, 128, 1024, "ZT_NO_PALLAS_C2R")


def use_zx_folded(dtype, n: int) -> bool:
    """Fused single-plane kernel gate (the per-plane VMEM budget caps n)."""
    return _gate(dtype, n, 128, 512)
