"""Chunked k-space checkpoints: the PART1/PART2 boundary at scale.

The reference's PART split restarts from its on-disk block files, which
are inherently chunked (src/block_array.cpp:166-197); a whole-grid
``np.save`` is a single-file, single-writer, 2x-memory operation that
cannot work at 4096^3.  A checkpoint here is a *directory*:

    zeldovich.kspace.ckpt/
      meta.json            {shape, dtype, chunk}
      k_00000.npy          y-slabs [.., y0:y0+chunk, Z, X]
      k_00032.npy          ...

Save streams y-slabs off the device with the async-copy-one-ahead
discipline (utils/streamio.py); load fills a preallocated host buffer
chunk by chunk (or memmaps each chunk for lazy consumers).  Extra memory
is one chunk, not one grid.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from .streamio import _dslice, _start_host_copy


def _chunk_y(shape, itemsize, target_bytes):
    Y = shape[-3]
    per_plane = int(np.prod(shape)) // Y * itemsize
    want = max(1, min(Y, int(target_bytes // per_plane) or 1))
    while Y % want:
        want -= 1
    return want


def save_kspace(kgrid, path, target_bytes: int = 1 << 30) -> Path:
    """Checkpoint a k-space grid [.., Y, Z, X] to a chunk directory."""
    import jax

    path = Path(path)
    # wipe any previous checkpoint: a partial re-save over stale chunks
    # must never pass exists() and silently mix old and new data, so the
    # chunks are written first and meta.json (the validity marker) LAST
    remove_kspace(path)
    path.mkdir(parents=True, exist_ok=True)
    Y = kgrid.shape[-3]
    chunk = _chunk_y(kgrid.shape, kgrid.dtype.itemsize, target_bytes)
    on_device = isinstance(kgrid, jax.Array)

    def slab(y0):
        if on_device:
            return _dslice(kgrid, y0, chunk, -3)
        return kgrid[..., y0 : y0 + chunk, :, :]

    prev = None
    for y0 in range(0, Y, chunk):
        c = slab(y0)
        _start_host_copy(c)
        if prev is not None:
            np.save(path / f"k_{prev[0]:05d}.npy", np.asarray(prev[1]))
        prev = (y0, c)
    if prev is not None:
        np.save(path / f"k_{prev[0]:05d}.npy", np.asarray(prev[1]))
    (path / "meta.json").write_text(
        json.dumps(
            {
                "shape": list(kgrid.shape),
                "dtype": np.dtype(kgrid.dtype).str,
                "chunk": chunk,
            }
        )
    )
    return path


def load_kspace(path) -> np.ndarray:
    """Load a chunked checkpoint back into one host array."""
    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    shape, chunk = tuple(meta["shape"]), meta["chunk"]
    out = np.empty(shape, dtype=np.dtype(meta["dtype"]))
    for y0 in range(0, shape[-3], chunk):
        out[..., y0 : y0 + chunk, :, :] = np.load(path / f"k_{y0:05d}.npy")
    return out


def remove_kspace(path):
    import shutil

    shutil.rmtree(path, ignore_errors=True)


def exists(path) -> bool:
    return (Path(path) / "meta.json").exists()
