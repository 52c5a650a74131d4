"""Complex-free mode synthesis: (re, im) real-pair twin of modes_fast.

Same math as ops/modes_fast.synthesize_full_fast (half-space generation +
reflection assembly) with every complex number carried as explicit real
pairs, so the graph contains no complex dtypes.  Pairs with ops/mmfft for
toolchains (like some TPU tunnels) that reject complex types, and doubles
as the layout the matmul FFT wants anyway.

Equality with the complex path is asserted in tests; any change here must
keep its twin in sync.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import pcg_device
from .modes import SynthConfig, SynthTables
from .modes_fast import _reflect_zx


def _assemble_pair(re, im, half):
    """Full-space (re, im) from half-space raw fields (conj = negate im)."""
    ppd = re.shape[-1]
    z = jnp.arange(ppd)[:, None]
    x = jnp.arange(ppd)[None, :]
    fix = (z > half) | ((z == 0) & (x > half))
    origin = (z == 0) & (x == 0)

    def one(a, flip_sign):
        p0 = a[..., 0, :, :]
        fixed = jnp.where(fix, flip_sign * _reflect_zx(p0), p0)
        fixed = jnp.where(origin, jnp.zeros_like(fixed), fixed)
        top = jnp.concatenate([fixed[..., None, :, :], a[..., 1:, :, :]], axis=-3)
        nyq = jnp.zeros_like(fixed)[..., None, :, :]
        bottom = flip_sign * _reflect_zx(jnp.flip(a[..., 1:, :, :], axis=-3))
        return jnp.concatenate([top, nyq, bottom], axis=-3)

    return one(re, 1.0), one(im, -1.0)


@partial(jax.jit, static_argnames=("cfg", "dtype", "gen_phi"))
def synthesize_full_fast_pair(
    cfg: SynthConfig,
    tables: SynthTables,
    dtype=jnp.float32,
    gen_phi: bool = False,
    phi_pair=None,
):
    """Full k-grid as real pairs: (narray, 2, ppd, ppd, ppd).

    phi_pair: optional (2, ppd, ppd, ppd) phi(k) pair for the f_NL input
    pass.
    """
    fdt = dtype
    ppd = cfg.ppd
    half = ppd // 2
    y = jnp.arange(half)[:, None, None]
    z = jnp.arange(ppd)[None, :, None]
    x = jnp.arange(ppd)[None, None, :]

    ky = y
    kz = jnp.where(z > half, z - ppd, z)
    kx = jnp.where(x > half, x - ppd, x)
    n2 = (kx * kx + ky * ky + kz * kz).astype(jnp.int32)
    k2 = n2.astype(fdt) * fdt(cfg.fundamental) ** 2

    if phi_pair is not None:
        zero = n2 == 0
    else:
        zero = (
            (jnp.abs(kx) == cfg.kmax_int)
            | (jnp.abs(ky) == cfg.kmax_int)
            | (jnp.abs(kz) == cfg.kmax_int)
        )
        if not cfg.corner_modes:
            zero |= k2 >= fdt(cfg.k2_cutoff)
        if cfg.qonemode:
            om = cfg.one_mode
            zero |= ~((kx == om[0]) & (ky == om[1]) & (kz == om[2]))

    if phi_pair is None:
        sy_rng = jnp.minimum(y, half - 1)
        if tables.mzx is not None:
            R, T = pcg_device.uniform_pair_from_affine(
                tables.planes[sy_rng],
                tables.mzx[z, x],
                tables.czx[z, x],
                dtype=fdt,
            )
        else:
            R, T = pcg_device.mode_uniform_pair(
                tables.planes[sy_rng],
                tables.mz[z],
                tables.cz[z],
                tables.mx[x],
                tables.cx[x],
                dtype=fdt,
            )
        Pk = tables.pk_n2[n2].astype(fdt)
        amp = jnp.sqrt(Pk) if cfg.fixed_power else jnp.sqrt(-Pk * jnp.log(R))
        theta = fdt(2 * np.pi) * T
        D_re = amp * jnp.cos(theta)
        D_im = amp * jnp.sin(theta)
    else:
        M = tables.M_n2[n2].astype(fdt)
        D_re = phi_pair[0, :half] * M
        D_im = phi_pair[1, :half] * M

    zf = jnp.where(zero, fdt(0), fdt(1))
    D_re = D_re * zf
    D_im = D_im * zf

    if gen_phi:
        M = tables.M_n2[n2].astype(fdt)
        invM = jnp.where(n2 == 0, fdt(0), 1.0 / jnp.where(n2 == 0, fdt(1), M))
        pr, pi = _assemble_pair(D_re * invM, D_im * invM, half)
        return jnp.stack([pr, pi])[None]

    ik2 = jnp.where(n2 == 0, fdt(0), 1.0 / jnp.where(n2 == 0, fdt(1), k2))
    if cfg.qPLT:
        from .plt import eigenmode_lookup

        evec, eval_ = eigenmode_lookup(kx, ky, kz, ppd, tables.eig, dtype=fdt)
        f = (jnp.sqrt(1.0 + 24.0 * eval_ * fdt(cfg.f_cluster)) - 1.0) * fdt(0.25)
        if cfg.qPLTrescale:
            rescale = fdt(cfg.plt_rescale_base) ** (fdt(cfg.plt_target_f) - f)
        else:
            rescale = fdt(1.0)
    else:
        evec = (kx.astype(fdt), ky.astype(fdt), kz.astype(fdt))
        f = fdt(1.0)
        rescale = fdt(1.0)

    scale = rescale * fdt(cfg.fundamental) * ik2
    # F_j = evec_j * scale * (i D): re = -evec*scale*D_im, im = evec*scale*D_re
    sx_, sy_, sz_ = (evec[0] * scale, evec[1] * scale, evec[2] * scale)

    def field(coef):
        return -coef * D_im, coef * D_re

    if cfg.just_density:
        re, im = _assemble_pair(D_re, D_im, half)
        return jnp.stack([re, im])[None]

    F = field(sx_)
    G = field(sy_)
    H = field(sz_)

    def pack(Dp, Fp):
        """(D + iF) assembled: returns (re, im) full-space."""
        dr, di = _assemble_pair(Dp[0], Dp[1], half)
        fr, fi = _assemble_pair(Fp[0], Fp[1], half)
        return jnp.stack([dr - fi, di + fr])

    A = pack((D_re, D_im), F)
    B = pack(G, H)
    if not cfg.qPLT:
        return jnp.stack([A, B])

    Ff = (F[0] * f, F[1] * f)
    Gf = (G[0] * f, G[1] * f)
    Hf = (H[0] * f, H[1] * f)
    zero2 = (jnp.zeros_like(D_re), jnp.zeros_like(D_im))
    A2 = pack(zero2, Ff)
    B2 = pack(Gf, Hf)
    return jnp.stack([A, B, A2, B2])
