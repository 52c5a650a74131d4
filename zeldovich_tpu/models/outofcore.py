"""Out-of-core pipeline: grids larger than device memory.

The TPU-native analog of the reference's ``-DDISK`` mode (BlockArray,
src/block_array.cpp; README.md:65-104): the full ``narray * ppd^3`` complex
grid lives in a host staging buffer (RAM, or a disk memmap for beyond-RAM
problems) and the device streams slabs through the same fused kernels:

  pass 1 (y-slabs):  synthesize [narray, By, Z, X] -> inverse FFT over
                     z and x (both fully resident per y-slab) -> stage out.
  pass 2 (z-slabs):  stage in [narray, Y, Bz, X] (the host buffer *is* the
                     y<->z transpose fabric -- numpy strided slicing
                     replaces StoreBlock/LoadBlock's block files) ->
                     inverse FFT over y -> decode + write particles.

The f_NL flow adds a staged phi round trip; mirror-half phi values are
served to the synthesis kernel as a host-side reflected slab (the tuple
form of ``phi_k``), so no global gather is ever needed.

Host<->device traffic is 2 reads + 2 writes of the grid per transform pass
-- the same volume the reference moves to disk, but at PCIe/host-DMA
bandwidth and overlapped with compute by slab pipelining.

The staged buffer after pass 1 doubles as the PART1/PART2 checkpoint
(the reference's on-disk block files, zeldovich.cpp:835-846).
"""

from __future__ import annotations

import sys
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.modes import synthesize_slab
from ..utils.output import OutputWriter, setup_output_dir
from .pipeline import Zeldovich


@partial(jax.jit, static_argnames=("y0", "ny", "cfg", "dtype", "gen_phi"))
def _synth_ifft_zx(y0, ny, cfg, tables, dtype, gen_phi=False, phi_pair=None,
                   D_source=None):
    """Synthesize a y-slab and inverse-FFT it along z and x."""
    k = synthesize_slab(
        y0, ny, cfg, tables, dtype=dtype, gen_phi=gen_phi, phi_k=phi_pair,
        D_source=D_source,
    )
    n = k.shape[-1]
    return jnp.fft.ifftn(k, axes=(2, 3)) * (n * n)


@jax.jit
def _ifft_y(zslab):
    """Inverse FFT along y of a staged z-slab [narray, Y, Bz, X]."""
    return jnp.fft.ifft(zslab, axis=1) * zslab.shape[1]


@jax.jit
def _fwd_y_phi_nl(zslab, f_NL, inv_n3):
    """phi z-slab: finish inverse FFT (y), apply non-linearity, forward y."""
    phi_x = (jnp.fft.ifft(zslab, axis=1) * zslab.shape[1]).real
    phi_x = (phi_x + f_NL * phi_x * phi_x) * inv_n3
    return jnp.fft.fft(phi_x.astype(zslab.dtype), axis=1)


@partial(jax.jit, static_argnames=())
def _fwd_zx(yslab):
    """Forward FFT along z and x of a phi y-slab [narray, By, Z, X]."""
    return jnp.fft.fftn(yslab, axes=(2, 3))


class OutOfCoreZeldovich(Zeldovich):
    """Streamed pipeline with a host-resident (or disk-memmapped) grid."""

    def __init__(self, param, dtype=jnp.float64, slab_bytes=2 << 30,
                 backing: str = "ram"):
        super().__init__(param, dtype=dtype)
        self.backing = backing
        itemsize = 16 if dtype == jnp.float64 else 8
        row = param.ppd * param.ppd * param.narray * itemsize
        self.slab = max(1, min(param.ppd, slab_bytes // row))
        while param.ppd % self.slab:
            self.slab -= 1
        self._cnp = np.complex128 if dtype == jnp.float64 else np.complex64

    # -- staging buffer -------------------------------------------------
    def _alloc_stage(self, narray, name="zeldovich.stage"):
        p = self.param
        shape = (narray, p.ppd, p.ppd, p.ppd)
        if self.backing == "disk":
            path = p.output_path / f"{name}.mm"
            path.parent.mkdir(parents=True, exist_ok=True)
            return np.memmap(path, dtype=self._cnp, mode="w+", shape=shape)
        return np.empty(shape, dtype=self._cnp)

    # -- phi round trip -------------------------------------------------
    def _phi_stage(self):
        p = self.param
        stage = self._alloc_stage(1, "zeldovich.phi")
        for y0 in range(0, p.ppd, self.slab):
            stage[:, y0 : y0 + self.slab] = np.asarray(
                _synth_ifft_zx(
                    y0, self.slab, self.cfg, self.tables, self.dtype,
                    gen_phi=True, D_source=self._D_source,
                )
            )
        f_NL = self.dtype(p.f_NL)
        inv_n3 = self.dtype(1.0 / p.ppd**3)
        for z0 in range(0, p.ppd, self.slab):
            zin = jnp.asarray(stage[:, :, z0 : z0 + self.slab])
            stage[:, :, z0 : z0 + self.slab] = np.asarray(
                _fwd_y_phi_nl(zin, f_NL, inv_n3)
            )
        for y0 in range(0, p.ppd, self.slab):
            yin = jnp.asarray(stage[:, y0 : y0 + self.slab])
            stage[:, y0 : y0 + self.slab] = np.asarray(_fwd_zx(yin))
        return stage  # phi(k), full Hermitian grid, host-resident

    def _phi_pair_for_slab(self, phi_stage, y0):
        """(phi_same, phi_refl) local blocks for output y-slab [y0, y0+B)."""
        p = self.param
        ys = np.arange(y0, y0 + self.slab)
        refl = (-np.arange(p.ppd)) % p.ppd
        phi_same = phi_stage[0, ys]
        phi_refl = phi_stage[0][(p.ppd - ys) % p.ppd][:, refl][:, :, refl]
        return (jnp.asarray(phi_same), jnp.asarray(phi_refl))

    # -- main passes ----------------------------------------------------
    def stage_pass1(self, stage=None):
        """Pass 1: synthesis + z/x inverse FFTs, staged to host, [a,y,z,x]."""
        p = self.param
        phi_stage = self._phi_stage() if p.f_NL != 0 else None
        if stage is None:
            stage = self._alloc_stage(p.narray)
        for y0 in range(0, p.ppd, self.slab):
            phi_pair = (
                self._phi_pair_for_slab(phi_stage, y0)
                if phi_stage is not None
                else None
            )
            stage[:, y0 : y0 + self.slab] = np.asarray(
                _synth_ifft_zx(
                    y0, self.slab, self.cfg, self.tables, self.dtype,
                    phi_pair=phi_pair, D_source=self._D_source,
                )
            )
        del phi_stage
        return stage

    def run(self, setup_dir: bool = True, stage=None) -> OutputWriter:
        p = self.param
        if setup_dir:
            setup_output_dir(p)
        if stage is None:
            stage = self.stage_pass1()
        writer = OutputWriter(p)
        for z0 in range(0, p.ppd, self.slab):
            zslab = np.asarray(_ifft_y(jnp.asarray(stage[:, :, z0 : z0 + self.slab])))
            for dz in range(zslab.shape[2]):
                writer.write_slab(z0 + dz, zslab[:, :, dz, :])
        writer.close()
        writer.report(self.Pk)
        return writer
