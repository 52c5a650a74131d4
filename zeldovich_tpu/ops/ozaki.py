"""f64-accurate matmuls on the int8 MXU (Ozaki-scheme mantissa slicing).

TPU has no native f64 MXU path: XLA emulates f64 dots orders of magnitude
below peak, and the f32 path (6-pass bf16, ``Precision.HIGHEST``) carries
~21 effective mantissa bits -- measured 8.8e-6 max displacement error at
256^3, outside the <1e-6 parity target (BASELINE.md).  The Ozaki scheme
recovers f64-grade accuracy from EXACT integer matmuls:

  1. scale each operand by a power of two so |x| <= 1;
  2. slice the mantissa into base-64 limbs: x = s * sum_i q_i 64^-(i+1)
     with q_i integer, |q_i| <= 64 -- an int8-exact representation;
  3. multiply limb pairs on the int8 MXU.  int32 accumulation is exact
     (k * 64^2 < 2^31 for k < 512k), so the ONLY errors are the dropped
     limb tails -- ~2^-36 relative for 6 limbs / cross-order cutoff 5;
  4. recombine the int32 partial products in float64 (cheap elementwise).

For DFT matmuls the matrix side is static, so its limbs are precomputed
exactly on host at trace time; only the data side is sliced at runtime.

Used by ops/mmfft.py for float64 transforms when the backend's native f64
matmul is emulated (any accelerator); pure-CPU runs keep real f64 BLAS.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

BASE_BITS = 6
BASE = 1 << BASE_BITS  # 64: |round(r * 64)| <= 64 fits int8 with no clipping

#: limbs per operand / max cross order kept.  6/5 -> ~2^-36 input
#: representation, ~2^-42 dropped-tail error: ~1e-11 relative, 5 orders
#: beyond the 1e-6 parity bar, at 21 int8 matmuls per real f64 matmul.
NLIMB = int(os.environ.get("ZT_OZAKI_LIMBS", "6"))


def _pow2_ceil(m: float) -> float:
    if not np.isfinite(m) or m <= 0.0:
        return 1.0
    return float(2.0 ** np.ceil(np.log2(m)))


def slice_static(W: np.ndarray, nlimb: int = NLIMB):
    """Exact host-side limb decomposition of a static matrix.

    Returns (scale, [int8 arrays]): W ~= scale * sum_i limbs[i] * 64^-(i+1)
    to nlimb * 6 bits.
    """
    W = np.asarray(W, dtype=np.float64)
    scale = _pow2_ceil(np.abs(W).max())
    r = W / scale
    limbs = []
    for _ in range(nlimb):
        r = r * BASE
        q = np.rint(r)
        limbs.append(q.astype(np.int8))
        r = r - q
    return scale, limbs


def _slice_dynamic(X, nlimb: int):
    """Traced limb decomposition of the data side (f64 in, int8 limbs out)."""
    m = jnp.max(jnp.abs(X))
    # power-of-two scale: exact division, no rounding introduced
    scale = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(m, jnp.float64(1e-300)))))
    scale = jnp.where(m == 0.0, jnp.float64(1.0), scale)
    r = X / scale
    limbs = []
    for _ in range(nlimb):
        r = r * BASE
        q = jnp.round(r)
        limbs.append(q.astype(jnp.int8))
        r = r - q
    return scale, limbs


def omatmul(X, W_sliced, nlimb: int = NLIMB, cutoff: int | None = None):
    """X @ W with f64-grade accuracy via int8 MXU matmuls.

    X: (..., k) float64; W_sliced: (scale, limbs) from slice_static with
    limbs of shape (k, n).  Keeps cross terms i + j <= cutoff
    (default nlimb - 1).
    """
    if cutoff is None:
        cutoff = nlimb - 1
    sw, wl = W_sliced
    sx, xl = _slice_dynamic(X, nlimb)
    out = None
    for i in range(min(nlimb, cutoff + 1)):
        for j in range(min(len(wl), cutoff + 1 - i)):
            p = jnp.matmul(xl[i], wl[j], preferred_element_type=jnp.int32)
            term = p.astype(jnp.float64) * (2.0 ** (-BASE_BITS * (i + j + 2)))
            out = term if out is None else out + term
    return out * (sx * sw)


def use_ozaki(dtype) -> bool:
    """Whether f64 matmuls should route through the int8 scheme here.

    Accelerators emulate f64 dots; CPU has real f64 BLAS.  ZT_OZAKI=0/1
    forces either way.
    """
    if dtype != jnp.float64:
        return False
    knob = os.environ.get("ZT_OZAKI")
    if knob is not None:
        return knob != "0"
    return jax.default_backend() != "cpu"


