"""Mesh-sharded mode synthesis.

Because the synthesis kernel is a pure function of the *global* grid index
(ops/modes.py), sharding it is trivial: each device derives its (y, z)
index ranges from its mesh coordinates and generates its own block --
including Hermitian-mirror entries, which re-derive their source mode
locally instead of communicating.  The RNG/spline tables are tiny and
replicated.

The only cross-shard dependency in the whole pipeline is the f_NL input
pass, where mirror entries need phi(k) at the reflected index; that is a
(flip + roll) permutation of the sharded grid, computed once with XLA
collectives and passed in as a second local block.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.modes import SynthConfig, SynthTables, synthesize


def reflected(garr):
    """refl[..., i, j, k] = garr[..., (-i) % n, (-j) % n, (-k) % n].

    On a sharded grid this lowers to XLA collective permutes.
    """
    out = garr
    for ax in (-3, -2, -1):
        out = jnp.roll(jnp.flip(out, axis=ax), 1, axis=ax)
    return out


def synthesize_sharded(
    cfg: SynthConfig,
    tables: SynthTables,
    mesh: Mesh,
    dtype=jnp.float64,
    gen_phi: bool = False,
    phi_k=None,
):
    """Full k-grid (narray, Y, Z, X) sharded (None, "y", "z", None)."""
    ppd = cfg.ppd
    py, pz = mesh.shape["y"], mesh.shape["z"]
    if ppd % py or ppd % pz:
        raise ValueError(f"ppd={ppd} not divisible by mesh (y={py}, z={pz})")
    yl, zl = ppd // py, ppd // pz

    gspec = P(None, "y", "z", None)
    tab_spec = jax.tree.map(lambda _: P(), tables)

    def kernel(tables, phi_pair):
        iy = jax.lax.axis_index("y")
        iz = jax.lax.axis_index("z")
        y = (iy * yl + jnp.arange(yl))[:, None, None]
        z = (iz * zl + jnp.arange(zl))[None, :, None]
        x = jnp.arange(ppd)[None, None, :]
        phi = None
        if phi_pair is not None:
            phi = (phi_pair[0][0], phi_pair[1][0])
        return synthesize(
            y, z, x, cfg, tables, dtype=dtype, gen_phi=gen_phi, phi_k=phi
        )

    if phi_k is not None:
        phi_pair = (phi_k[None], reflected(phi_k)[None])
        f = shard_map(
            kernel,
            mesh=mesh,
            in_specs=(tab_spec, (gspec, gspec)),
            out_specs=gspec,
        )
        return f(tables, phi_pair)

    f = shard_map(
        partial(kernel, phi_pair=None),
        mesh=mesh,
        in_specs=(tab_spec,),
        out_specs=gspec,
    )
    return f(tables)


def synthesize_sharded_pair(
    cfg: SynthConfig,
    tables: SynthTables,
    mesh: Mesh,
    dtype=None,
    gen_phi: bool = False,
    phi_pair=None,
):
    """Complex-free sharded synthesis: (narray, 2, Y, Z, X) real pairs.

    Twin of synthesize_sharded for toolchains without complex support;
    phi_pair is a (2, Y, Z, X) sharded pair grid (f_NL input pass) whose
    reflected counterpart is produced with collective permutes.
    """
    from ..ops.modes_real import synthesize_pair

    if dtype is None:
        dtype = jnp.float32
    ppd = cfg.ppd
    py, pz = mesh.shape["y"], mesh.shape["z"]
    if ppd % py or ppd % pz:
        raise ValueError(f"ppd={ppd} not divisible by mesh (y={py}, z={pz})")
    yl, zl = ppd // py, ppd // pz

    gspec = P(None, None, "y", "z", None)
    pspec = P(None, "y", "z", None)
    tab_spec = jax.tree.map(lambda _: P(), tables)

    def kernel(tables, phi_blocks):
        iy = jax.lax.axis_index("y")
        iz = jax.lax.axis_index("z")
        y = (iy * yl + jnp.arange(yl))[:, None, None]
        z = (iz * zl + jnp.arange(zl))[None, :, None]
        x = jnp.arange(ppd)[None, None, :]
        pp = None
        if phi_blocks is not None:
            same, refl = phi_blocks
            pp = ((same[0], same[1]), (refl[0], refl[1]))
        return synthesize_pair(
            y, z, x, cfg, tables, dtype=dtype, gen_phi=gen_phi, phi_pair=pp
        )

    if phi_pair is not None:
        refl = reflected(phi_pair)
        f = shard_map(
            kernel,
            mesh=mesh,
            in_specs=(tab_spec, (pspec, pspec)),
            out_specs=gspec,
        )
        return f(tables, (phi_pair, refl))

    f = shard_map(
        partial(kernel, phi_blocks=None),
        mesh=mesh,
        in_specs=(tab_spec,),
        out_specs=gspec,
    )
    return f(tables)
