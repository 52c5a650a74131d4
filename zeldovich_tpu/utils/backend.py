"""Backend capability detection.

Some TPU toolchains (observed: a v5e behind a remote-compile tunnel)
reject complex dtypes at compilation.  The pipeline has a complex-free
twin (real pairs + matmul FFT); this module decides which to use.
"""

from __future__ import annotations

import functools
import sys


@functools.cache
def supports_complex() -> bool:
    """True if the default backend can compile+execute complex64 ops."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        return True
    try:
        v = jax.jit(lambda a: (a + 1j * a) * (2.0 + 0j))(
            jnp.ones(8, jnp.float32)
        )
        np.asarray(v)  # errors can surface only at fetch
        return True
    except Exception:
        print(
            "Note: backend rejects complex dtypes; using the complex-free "
            "(real-pair + matmul-FFT) pipeline.",
            file=sys.stderr,
        )
        return False
