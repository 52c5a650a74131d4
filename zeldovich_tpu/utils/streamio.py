"""Overlapped device->host output streaming.

Replaces the full-grid host gather with a pipelined stream, matching the
reference's per-slab streaming discipline (src/zeldovich.cpp:666-683,
src/output.cpp:208-212) but with true overlap instead of serial stalls:

  device:   slice z-chunk i+1 out of the x-space grid, start its host copy
            (``copy_to_host_async``) ...
  host:     ... while chunk i materializes and a background writer thread
            decodes/packs/appends chunk i-1 to its ic_* files.

Three stages (device slice+DMA, host materialize, pack+IO) run
concurrently; peak extra host memory is two chunks, not the whole grid.
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class AsyncSlabWriter:
    """Runs ``writer.write_slab`` calls on a background thread.

    Submissions are FIFO (the density file and per-file appends require
    z-order within each ic_* file); all writer-state mutation happens on
    the one worker thread, so OutputWriter needs no locking.  Errors are
    captured and re-raised on the submitting thread at the next submit()
    or at close().
    """

    def __init__(self, writer, depth: int = 4):
        self.writer = writer
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._error: BaseException | None = None
        self._t = threading.Thread(
            target=self._loop, daemon=True, name="zt-slab-writer"
        )
        self._t.start()

    def _loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            if self._error is None:
                try:
                    self.writer.write_slab(*item)
                except BaseException as e:  # noqa: BLE001 - repropagated
                    self._error = e

    def submit(self, z: int, slab: np.ndarray):
        if self._error is not None:
            raise self._error
        self._q.put((z, slab))

    def close(self, close_writer: bool = True):
        self._q.put(None)
        self._t.join()
        try:
            if self._error is not None:
                raise self._error
        finally:
            # close file handles even on a captured worker error (ENOSPC
            # mid-run must not leak the density fp / parallel ic_* fds)
            if close_writer:
                self.writer.close()


def _chunk_planes(shape, itemsize, ppd, pair, target_bytes):
    """z-planes per fetch chunk: the largest divisor of ppd within ~target.

    A divisor keeps every chunk the same shape, so the device-side slice
    (a jitted dynamic_slice with a traced start) compiles exactly once.
    """
    narray = shape[0]
    per_plane = narray * (2 if pair else 1) * ppd * ppd * itemsize
    want = max(1, min(ppd, int(target_bytes // per_plane) or 1))
    while ppd % want:
        want -= 1
    return want


_DSLICE = None


def _dslice(arr, z0, size, axis):
    """Jitted chunk slice with a *traced* start: compiles once per size
    (a static start would mean one XLA program per chunk index)."""
    global _DSLICE
    if _DSLICE is None:
        from functools import partial

        import jax

        @partial(jax.jit, static_argnames=("size", "axis"))
        def f(arr, z0, size, axis):
            return jax.lax.dynamic_slice_in_dim(arr, z0, size, axis=axis)

        _DSLICE = f
    return _DSLICE(arr, z0, size, axis)


def stream_xspace(
    x,
    writer,
    pair: bool = False,
    chunk: int | None = None,
    target_bytes: int = 256 << 20,
    close: bool = True,
):
    """Stream a device-resident x-space grid through the particle writer.

    x: [narray, Y, Z, X] complex (or [narray, 2, Y, Z, X] real pairs when
    ``pair``), device- or host-resident.  Chunks of z-planes are sliced on
    device and copied to host asynchronously one chunk ahead of the writer.
    """
    import jax

    ppd = x.shape[-2]
    if chunk is None:
        chunk = _chunk_planes(x.shape, x.dtype.itemsize, ppd, pair, target_bytes)

    if isinstance(x, jax.Array):
        # one compiled slice program for all chunks: traced start index
        def dev_slice(z0, z1):
            return _dslice(x, z0, z1 - z0, -2)
    else:

        def dev_slice(z0, z1):
            if pair:
                return x[:, :, :, z0:z1, :]
            return x[:, :, z0:z1, :]

    aw = AsyncSlabWriter(writer)
    try:
        pending = None  # (z0, device chunk)
        for z0 in range(0, ppd, chunk):
            c = dev_slice(z0, min(z0 + chunk, ppd))
            _start_host_copy(c)
            if pending is not None:
                _flush_chunk(aw, *pending, pair=pair)
            pending = (z0, c)
        if pending is not None:
            _flush_chunk(aw, *pending, pair=pair)
    finally:
        aw.close(close_writer=close)
    return writer


def _start_host_copy(arr):
    copy = getattr(arr, "copy_to_host_async", None)
    if copy is not None:
        try:
            copy()
        except Exception:  # pragma: no cover - optional fast path
            pass


def _flush_chunk(aw: AsyncSlabWriter, z0: int, c, pair: bool):
    h = np.asarray(c)
    if pair:
        h = h[:, 0] + 1j * h[:, 1]
    for dz in range(h.shape[2]):
        aw.submit(z0 + dz, h[:, :, dz, :])
