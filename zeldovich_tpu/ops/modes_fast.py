"""Half-space synthesis with reflection assembly: the single-device fast path.

``ops.modes.synthesize`` recomputes a mirror element's source mode so that
*any shard* can generate *any element* with zero communication -- the right
trade on a mesh.  On a single device (or within one shard's local block
when the mesh axis sizes allow), recomputation is pure waste: this variant
generates raw fields only on the ``y < ppd/2`` half-space and materializes
the Hermitian mirror with flips/rolls/conjugations -- memory-bound ops --
halving the RNG + Box-Muller + eigenmode work.

Produces output identical (elementwise, same float ops) to
``synthesize_slab(0, ppd, ...)``; asserted in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .modes import SynthConfig, SynthTables, _raw_fields


def _reflect_zx(a):
    """a[..., (ppd-z) % ppd, (ppd-x) % ppd] over the last two axes."""
    for ax in (-2, -1):
        a = jnp.roll(jnp.flip(a, axis=ax), 1, axis=ax)
    return a


def _assemble(field, half, conj=jnp.conj):
    """Full-space field from the half-space raw field.

    field: (..., half, ppd, ppd) raw values for planes y in [0, half).
    Mirror planes ppd-y take the per-field conjugate at reflected (z, x);
    plane 0's negative half takes its own reflection; y = half is zero.
    """
    p0 = field[..., 0, :, :]
    ppd = p0.shape[-1]
    z = jnp.arange(ppd)[:, None]
    x = jnp.arange(ppd)[None, :]
    fix = (z > half) | ((z == 0) & (x > half))
    p0 = jnp.where(fix, conj(_reflect_zx(p0)), p0)
    origin = (z == 0) & (x == 0)
    p0 = jnp.where(origin, jnp.zeros_like(p0), p0)

    top = jnp.concatenate([p0[..., None, :, :], field[..., 1:, :, :]], axis=-3)
    nyq = jnp.zeros_like(p0)[..., None, :, :]
    # planes ppd-1 .. half+1 come from sources 1 .. half-1 in reverse order
    bottom = conj(_reflect_zx(jnp.flip(field[..., 1:, :, :], axis=-3)))
    return jnp.concatenate([top, nyq, bottom], axis=-3)


@partial(jax.jit, static_argnames=("cfg", "dtype", "gen_phi"))
def synthesize_full_fast(
    cfg: SynthConfig,
    tables: SynthTables,
    dtype=jnp.float64,
    gen_phi: bool = False,
    phi_k=None,
    D_source=None,
):
    """Full (narray, ppd, ppd, ppd) k-grid via half-space generation."""
    ppd = cfg.ppd
    half = ppd // 2
    y = jnp.arange(half)[:, None, None]
    z = jnp.arange(ppd)[None, :, None]
    x = jnp.arange(ppd)[None, None, :]

    phi_val = None if phi_k is None else phi_k[:half]
    D, F, G, H, f = _raw_fields(
        y, z, x, cfg, tables, dtype, phi_val=phi_val, D_source=D_source
    )

    if gen_phi:
        kz = jnp.where(z > half, z - ppd, z)
        kx = jnp.where(x > half, x - ppd, x)
        n2 = (kx * kx + y * y + kz * kz).astype(jnp.int32)
        M = tables.M_n2[n2].astype(dtype)
        phi = D / jnp.where(n2 == 0, dtype(1.0), M)
        return _assemble(phi, half)[None]

    def i_(w):
        return jax.lax.complex(-w.imag, w.real)

    if cfg.just_density:
        fields = (D,)
    elif cfg.qPLT:
        fields = (D, F, G, H, F * f, G * f, H * f)
    else:
        fields = (D, F, G, H)

    full = [_assemble(w, half) for w in fields]
    if cfg.just_density:
        return full[0][None]
    if cfg.qPLT:
        Df, Ff, Gf, Hf, Vx, Vy, Vz = full
        return jnp.stack(
            [Df + i_(Ff), Gf + i_(Hf), i_(Vx), Vy + i_(Vz)]
        )
    Df, Ff, Gf, Hf = full
    return jnp.stack([Df + i_(Ff), Gf + i_(Hf)])
