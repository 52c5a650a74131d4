"""Backend capability policy.

Some TPU toolchains reject complex dtypes at compilation -- and a failed
compilation can poison the whole client process, so probing at runtime is
not safe.  Policy instead:

* CPU backends: complex is always fine -> use the complex path.
* Accelerators: use the complex-free (real-pair + matmul-FFT) path by
  default -- it is the MXU-native formulation regardless of complex
  support.  Set ``ZT_COMPLEX=1`` to force the complex path on an
  accelerator known to support it.
"""

from __future__ import annotations

import functools
import os
import sys


@functools.cache
def supports_complex() -> bool:
    """Whether the pipeline should use complex dtypes on this backend."""
    import jax

    if jax.default_backend() == "cpu":
        return True
    if os.environ.get("ZT_COMPLEX") == "1":
        return True
    print(
        "Note: accelerator backend; using the complex-free "
        "(real-pair + matmul-FFT) pipeline. Set ZT_COMPLEX=1 to force "
        "complex-dtype kernels.",
        file=sys.stderr,
    )
    return False
