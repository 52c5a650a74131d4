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
from .pencil_fft import _fft, _ifft_scaled, _transform_axis_sharded
from .pencil_mmfft import _cfft_last_pair, _transform_axis_pair

_CACHE: dict = {}


def _check_slab(ppd, ny, mesh: Mesh):
    py, pz = mesh.shape["y"], mesh.shape["z"]
    if ny % py or ppd % pz or ppd % py or ppd % pz:
        raise ValueError(
            f"slab (ny={ny}, grid {ppd}) not divisible by mesh "
            f"(y={py}, z={pz})"
        )


def synth_ifft_zx_sharded(
    y0, ny, cfg, tables, dtype, mesh: Mesh, pair: bool,
    gen_phi: bool = False, phi_pair=None,
):
    """Pass-1 slab: sharded synthesis + inverse FFT over z and x.

    Returns [narray, ny, Z, X] (pair: [narray, 2, ny, Z, X]) sharded
    (ny over "y", Z over "z").  ``y0`` is traced: one compile per shape.

    ``phi_pair`` (the f_NL input pass) carries (same, reflected) phi(k)
    blocks elementwise-aligned with the slab's output indices -- host-
    precomputed reflections, so each device reads only its own rows:
    shape [ny, Z, X] per leaf, sharded (ny over "y", Z over "z").
    """
    ppd = cfg.ppd
    _check_slab(ppd, ny, mesh)
    key = ("synth", cfg, ny, dtype, mesh, pair, gen_phi, phi_pair is not None)
    f = _CACHE.get(key)
    if f is None:
        py, pz = mesh.shape["y"], mesh.shape["z"]
        yl, zl = ny // py, ppd // pz

        def kernel(tables, y0, phi_blocks):
            iy = jax.lax.axis_index("y")
            iz = jax.lax.axis_index("z")
            y = (y0 + iy * yl + jnp.arange(yl))[:, None, None]
            z = (iz * zl + jnp.arange(zl))[None, :, None]
            x = jnp.arange(ppd)[None, None, :]
            if pair:
                k = synthesize_pair(
                    y, z, x, cfg, tables, dtype=dtype, gen_phi=gen_phi,
                    phi_pair=phi_blocks,
                )
                b = jnp.swapaxes(k, 0, 1)  # (2, narray, yl, zl, X)
                b = _cfft_last_pair(b, +1)  # x local
                b = _transform_axis_pair(b, "z", -2, +1)
                return jnp.swapaxes(b, 0, 1)
            k = synthesize(
                y, z, x, cfg, tables, dtype=dtype, gen_phi=gen_phi,
                phi_k=phi_blocks,
            )
            k = jnp.fft.ifft(k, axis=-1) * ppd  # x local
            return _transform_axis_sharded(k, "z", -2, _ifft_scaled)

        gspec = (
            P(None, None, "y", "z", None) if pair else P(None, "y", "z", None)
        )
        tab_spec = jax.tree.map(lambda _: P(), tables)
        if phi_pair is None:
            from functools import partial

            f = jax.jit(
                shard_map(
                    partial(kernel, phi_blocks=None), mesh=mesh,
                    in_specs=(tab_spec, P()), out_specs=gspec,
                )
            )
        else:
            phi_spec = jax.tree.map(lambda _: P("y", "z", None), phi_pair)
            f = jax.jit(
                shard_map(
                    kernel, mesh=mesh,
                    in_specs=(tab_spec, P(), phi_spec), out_specs=gspec,
                )
            )
        _CACHE[key] = f
    if phi_pair is None:
        return f(tables, y0)
    return f(tables, y0, phi_pair)


def fwd_y_phi_nl_sharded(zslab, f_NL, inv_n3, mesh: Mesh, pair: bool):
    """phi z-slab: finish inverse FFT (y), apply non-linearity, forward y.

    zslab [1(, 2), Y, Bz, X] sharded (Y over "y", Bz over "z"); the y
    transforms ride one layout-preserving all_to_all pair each.
    """
    py, pz = mesh.shape["y"], mesh.shape["z"]
    Y, Bz, X = zslab.shape[-3], zslab.shape[-2], zslab.shape[-1]
    if Y % py or Bz % pz or X % py:
        raise ValueError(
            f"phi z-slab {zslab.shape[-3:]} not divisible by mesh "
            f"(y={py}, z={pz})"
        )
    key = ("phi_y", zslab.shape, zslab.dtype, mesh, pair)
    f = _CACHE.get(key)
    if f is None:
        if pair:

            def kernel(b, f_NL, inv_n3):
                b = jnp.swapaxes(b, 0, 1)  # (2, 1, Yl, Bzl, X)
                b = _transform_axis_pair(b, "y", -3, +1)
                phi_x = (b[0] + f_NL * b[0] * b[0]) * inv_n3
                b = jnp.stack([phi_x, jnp.zeros_like(phi_x)])
                b = _transform_axis_pair(b, "y", -3, -1)
                return jnp.swapaxes(b, 0, 1)

            gspec = P(None, None, "y", "z", None)
        else:

            def kernel(b, f_NL, inv_n3):
                phi = _transform_axis_sharded(b, "y", -3, _ifft_scaled)
                phi_x = (phi.real + f_NL * phi.real * phi.real) * inv_n3
                return _transform_axis_sharded(
                    phi_x.astype(b.dtype), "y", -3, _fft
                )

            gspec = P(None, "y", "z", None)
        f = jax.jit(
            shard_map(
                kernel, mesh=mesh, in_specs=(gspec, P(), P()),
                out_specs=gspec,
            )
        )
        _CACHE[key] = f
    return f(zslab, f_NL, inv_n3)


def fwd_zx_sharded(yslab, mesh: Mesh, pair: bool):
    """Forward FFT over z and x of a phi y-slab [1(, 2), By, Z, X]."""
    py, pz = mesh.shape["y"], mesh.shape["z"]
    By, Z, X = yslab.shape[-3], yslab.shape[-2], yslab.shape[-1]
    if By % py or Z % pz or X % pz:
        raise ValueError(
            f"phi y-slab {yslab.shape[-3:]} not divisible by mesh "
            f"(y={py}, z={pz})"
        )
    key = ("phi_zx", yslab.shape, yslab.dtype, mesh, pair)
    f = _CACHE.get(key)
    if f is None:
        if pair:

            def kernel(b):
                b = jnp.swapaxes(b, 0, 1)
                b = _cfft_last_pair(b, -1)  # x local
                b = _transform_axis_pair(b, "z", -2, -1)
                return jnp.swapaxes(b, 0, 1)

            gspec = P(None, None, "y", "z", None)
        else:

            def kernel(b):
                b = jnp.fft.fft(b, axis=-1)  # x local
                return _transform_axis_sharded(b, "z", -2, _fft)

            gspec = P(None, "y", "z", None)
        f = jax.jit(
            shard_map(kernel, mesh=mesh, in_specs=(gspec,), out_specs=gspec)
        )
        _CACHE[key] = f
    return f(yslab)


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
