"""Sharded out-of-core slab kernels: mesh + host staging combined.

Grids beyond the mesh's total HBM (the reference's ``-DDISK`` at
NumBlock > 2, holding 2/NB of the problem resident, README.md:98-100)
stream through the same host staging buffer as models/outofcore.py, but
each resident slab is itself sharded over the ("z", "y") device mesh:

  pass 1: a y-slab [narray, By, Z, X] sharded (By over "y", Z over "z")
          is synthesized in place (each device derives its global (y, z)
          ranges from its mesh coordinates) and inverse-transformed over
          x (local) and z (one layout-preserving all_to_all pair).
  pass 2: a z-slab [narray, Y, Bz, X] sharded (Y over "y", Bz over "z")
          is inverse-transformed over y the same way.

The host buffer remains the y<->z transpose fabric; the mesh never holds
more than one slab.  Slab thickness must divide by both mesh axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.modes import synthesize
from ..ops.modes_real import synthesize_pair
from .pencil_fft import _ifft_scaled, _transform_axis_sharded
from .pencil_mmfft import _cfft_last_pair, _transform_axis_pair

_CACHE: dict = {}


def _check_slab(ppd, ny, mesh: Mesh):
    py, pz = mesh.shape["y"], mesh.shape["z"]
    if ny % py or ppd % pz or ppd % py or ppd % pz:
        raise ValueError(
            f"slab (ny={ny}, grid {ppd}) not divisible by mesh "
            f"(y={py}, z={pz})"
        )


def synth_ifft_zx_sharded(y0, ny, cfg, tables, dtype, mesh: Mesh, pair: bool):
    """Pass-1 slab: sharded synthesis + inverse FFT over z and x.

    Returns [narray, ny, Z, X] (pair: [narray, 2, ny, Z, X]) sharded
    (ny over "y", Z over "z").  ``y0`` is traced: one compile per shape.
    """
    ppd = cfg.ppd
    _check_slab(ppd, ny, mesh)
    key = ("synth", cfg, ny, dtype, mesh, pair)
    f = _CACHE.get(key)
    if f is None:
        py, pz = mesh.shape["y"], mesh.shape["z"]
        yl, zl = ny // py, ppd // pz

        def kernel(tables, y0):
            iy = jax.lax.axis_index("y")
            iz = jax.lax.axis_index("z")
            y = (y0 + iy * yl + jnp.arange(yl))[:, None, None]
            z = (iz * zl + jnp.arange(zl))[None, :, None]
            x = jnp.arange(ppd)[None, None, :]
            if pair:
                k = synthesize_pair(y, z, x, cfg, tables, dtype=dtype)
                b = jnp.swapaxes(k, 0, 1)  # (2, narray, yl, zl, X)
                b = _cfft_last_pair(b, +1)  # x local
                b = _transform_axis_pair(b, "z", -2, +1)
                return jnp.swapaxes(b, 0, 1)
            k = synthesize(y, z, x, cfg, tables, dtype=dtype)
            k = jnp.fft.ifft(k, axis=-1) * ppd  # x local
            return _transform_axis_sharded(k, "z", -2, _ifft_scaled)

        gspec = (
            P(None, None, "y", "z", None) if pair else P(None, "y", "z", None)
        )
        tab_spec = jax.tree.map(lambda _: P(), tables)
        f = jax.jit(
            shard_map(
                kernel, mesh=mesh, in_specs=(tab_spec, P()), out_specs=gspec
            )
        )
        _CACHE[key] = f
    return f(tables, y0)


def ifft_y_sharded(zslab, mesh: Mesh, pair: bool):
    """Pass-2 slab: inverse FFT over y of [narray(, 2), Y, Bz, X]."""
    py, pz = mesh.shape["y"], mesh.shape["z"]
    Y, Bz, X = zslab.shape[-3], zslab.shape[-2], zslab.shape[-1]
    if Y % py or Bz % pz or X % py:
        raise ValueError(
            f"z-slab {zslab.shape[-3:]} not divisible by mesh (y={py}, z={pz})"
        )
    key = ("iffty", zslab.shape, zslab.dtype, mesh, pair)
    f = _CACHE.get(key)
    if f is None:
        if pair:

            def kernel(b):
                b = jnp.swapaxes(b, 0, 1)  # (2, narray, Y, Bzl, X)
                b = _transform_axis_pair(b, "y", -3, +1)
                return jnp.swapaxes(b, 0, 1)

            gspec = P(None, None, "y", "z", None)
        else:

            def kernel(b):
                return _transform_axis_sharded(b, "y", -3, _ifft_scaled)

            gspec = P(None, "y", "z", None)
        f = jax.jit(
            shard_map(kernel, mesh=mesh, in_specs=(gspec,), out_specs=gspec)
        )
        _CACHE[key] = f
    return f(zslab)
