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
def enable_compilation_cache() -> str | None:
    """Point jax's persistent compilation cache at a stable local dir.

    Remote-tunnel TPU compiles run 3-10 minutes per new graph; caching the
    serialized executable makes every later process (CLI runs, bench.py,
    profiling scripts) start in seconds.  Harmless where the backend does
    not support executable serialization -- jax skips the cache with a
    warning.  ``ZT_NO_COMPCACHE=1`` disables; ``ZT_COMPCACHE_DIR``
    overrides the location (default ~/.cache/zeldovich_tpu_xla).
    """
    if os.environ.get("ZT_NO_COMPCACHE"):
        return None
    import jax

    d = os.environ.get(
        "ZT_COMPCACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "zeldovich_tpu_xla"
        ),
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # never let cache plumbing break a run
        print(f"Note: compilation cache disabled ({e})", file=sys.stderr)
        return None
    return d


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
