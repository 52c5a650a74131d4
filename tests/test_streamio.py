"""Overlapped output streaming: ordering, parity, error propagation."""

import numpy as np
import pytest

import jax.numpy as jnp

from zeldovich_tpu.utils.streamio import AsyncSlabWriter, stream_xspace


class RecordingWriter:
    def __init__(self, fail_at=None):
        self.calls = []
        self.closed = False
        self.fail_at = fail_at

    def write_slab(self, z, slab):
        if self.fail_at is not None and z == self.fail_at:
            raise RuntimeError(f"boom at {z}")
        self.calls.append((z, np.array(slab)))

    def close(self):
        self.closed = True


def test_stream_matches_serial_complex():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 8)) + 1j * rng.normal(size=(2, 8, 8, 8))
    w = RecordingWriter()
    stream_xspace(jnp.asarray(x), w, chunk=3)
    assert w.closed
    assert [z for z, _ in w.calls] == list(range(8))  # z-order preserved
    for z, slab in w.calls:
        np.testing.assert_allclose(slab, x[:, :, z, :])


def test_stream_matches_serial_pair():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 2, 8, 8, 8)).astype(np.float32)
    w = RecordingWriter()
    stream_xspace(jnp.asarray(x), w, pair=True, chunk=5)
    for z, slab in w.calls:
        np.testing.assert_allclose(
            slab, x[:, 0, :, z, :] + 1j * x[:, 1, :, z, :]
        )


def test_writer_error_propagates():
    x = jnp.zeros((1, 4, 4, 4), dtype=jnp.complex128)
    w = RecordingWriter(fail_at=2)
    with pytest.raises(RuntimeError, match="boom"):
        stream_xspace(x, w, chunk=1)


def test_async_writer_fifo():
    w = RecordingWriter()
    aw = AsyncSlabWriter(w, depth=2)
    for z in range(32):
        aw.submit(z, np.full((1, 2, 2), z))
    aw.close()
    assert [z for z, _ in w.calls] == list(range(32))
    assert w.closed
