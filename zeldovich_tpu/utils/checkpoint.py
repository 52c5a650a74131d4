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


# -- sharded (multi-process) checkpoints ------------------------------------
# The distributed PART1/PART2 boundary: every process dumps its addressable
# device shards (one .npy per device, keyed by stable device id), plus one
# meta.json (written LAST, by process 0, after a barrier -- the validity
# marker) recording the mesh fingerprint so a restart with a different
# topology fails loudly instead of scrambling the grid.


def _spec_to_json(spec):
    return [
        list(e) if isinstance(e, tuple) else e for e in spec
    ]


def _spec_from_json(entries):
    from jax.sharding import PartitionSpec as P

    return P(*(tuple(e) if isinstance(e, list) else e for e in entries))


def _mesh_fingerprint(mesh) -> dict:
    return {
        "axis_names": list(mesh.axis_names),
        "mesh_shape": [int(mesh.shape[a]) for a in mesh.axis_names],
        "device_ids": [int(d.id) for d in mesh.devices.flat],
    }


def save_sharded(kgrid, path) -> Path:
    """Checkpoint a sharded grid: per-device shard files + meta marker."""
    import jax

    from ..parallel.multihost import barrier

    path = Path(path)
    if jax.process_index() == 0:
        remove_kspace(path)
        path.mkdir(parents=True, exist_ok=True)
    barrier("ckpt_wipe")
    prev = None
    for s in kgrid.addressable_shards:
        _start_host_copy(s.data)
        if prev is not None:
            np.save(path / f"shard_d{prev[0]}.npy", np.asarray(prev[1]))
        prev = (s.device.id, s.data)
    if prev is not None:
        np.save(path / f"shard_d{prev[0]}.npy", np.asarray(prev[1]))
    barrier("ckpt_shards")
    if jax.process_index() == 0:
        meta = {
            "shape": list(kgrid.shape),
            "dtype": np.dtype(kgrid.dtype).str,
            "spec": _spec_to_json(kgrid.sharding.spec),
            "nproc": jax.process_count(),
            **_mesh_fingerprint(kgrid.sharding.mesh),
        }
        (path / "meta.json").write_text(json.dumps(meta))
    barrier("ckpt_meta")
    return path


def load_sharded(path, mesh):
    """Reassemble a save_sharded checkpoint as a global sharded array.

    Validates the mesh fingerprint: the restart must present the same
    axis names/shape and device-id layout the checkpoint was cut for.
    """
    import jax
    from jax.sharding import NamedSharding

    path = Path(path)
    meta = json.loads((path / "meta.json").read_text())
    got = _mesh_fingerprint(mesh)
    for k in ("axis_names", "mesh_shape", "device_ids"):
        if meta[k] != got[k]:
            raise ValueError(
                f"checkpoint mesh mismatch: {k} saved={meta[k]} now={got[k]}"
            )
    if meta["nproc"] != jax.process_count():
        raise ValueError(
            f"checkpoint cut for {meta['nproc']} processes, "
            f"restarting with {jax.process_count()}"
        )
    sharding = NamedSharding(mesh, _spec_from_json(meta["spec"]))
    local = [d for d in mesh.devices.flat if d in set(jax.local_devices())]
    arrays = [
        jax.device_put(np.load(path / f"shard_d{d.id}.npy"), d)
        for d in local
    ]
    return jax.make_array_from_single_device_arrays(
        tuple(meta["shape"]), sharding, arrays
    )


def exists(path) -> bool:
    return (Path(path) / "meta.json").exists()
