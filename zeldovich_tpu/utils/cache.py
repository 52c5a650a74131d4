"""Bounded compiled-program caches.

The sharded kernels cache jitted shard_map programs keyed on
(cfg, mesh, shape, ...).  A long session sweeping grids and meshes --
exactly what bench and scale runs do -- must not accumulate compiled
executables without bound, so these caches evict least-recently-used
entries past a size cap (each entry pins an XLA executable, not just
Python objects).
"""

from __future__ import annotations

from collections import OrderedDict


class BoundedCache:
    """LRU-evicting mapping for compiled-program caches."""

    def __init__(self, maxsize: int = 32):
        self.maxsize = maxsize
        self._d: OrderedDict = OrderedDict()

    def get(self, key):
        v = self._d.get(key)
        if v is not None:
            self._d.move_to_end(key)
        return v

    def __setitem__(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def __len__(self):
        return len(self._d)

    def clear(self):
        self._d.clear()
