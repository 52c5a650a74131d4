"""Matmul FFT: complex transforms as real MXU matmuls (no complex dtypes).

Two reasons this exists:

1. It is the TPU-native way to spend FFT flops: a four-step (Bailey)
   decomposition N = N1*N2 turns each 1-D transform into two dense
   (N1 x N1) / (N2 x N2) matmuls plus an elementwise twiddle -- large,
   batched, systolic-array work instead of the VPU butterfly networks a
   classic FFT lowers to.  ~2 sqrt(N)/log2 N more flops than Cooley-Tukey,
   but MXU flops are an order of magnitude cheaper than VPU flops.

2. Some TPU toolchains reject complex dtypes outright, so the whole
   pipeline can run "complex-free": every complex array is carried as a
   stacked (re, im) pair and complex arithmetic is explicit real math.

Convention: ``sign=+1`` matches the reference's unnormalized inverse
(FFTW backward), ``sign=-1`` the forward transform; no 1/N anywhere.

All functions take/return real arrays with a leading length-2 (re, im)
axis immediately before the batch/data axes: shape (2, ...).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


#: Below this length a single dense N x N DFT matmul is used instead of the
#: four-step split.  The dense form does N/(2 sqrt N) more flops but keeps
#: the MXU contraction dimension large (a 16x16 split matmul runs the
#: 128x128 systolic array at ~1/8 utilization); the crossover on TPU sits
#: around 1-2k.
DENSE_MAX = 1024


def _factor(n: int) -> tuple[int, int]:
    """Balanced factorization n = n1 * n2 with n1 <= n2."""
    n1 = int(math.isqrt(n))
    while n % n1:
        n1 -= 1
    return n1, n // n1


def _dft_mats(n: int, sign: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """cos / sin matrices of the length-n DFT: W[j,k] = exp(sign*2pi i jk/n)."""
    j = np.arange(n)
    ang = (sign * 2.0 * np.pi / n) * np.outer(j, j)
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _twiddle(n1: int, n2: int, sign: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """T[k1, n2] = exp(sign*2pi i k1 n2 / (n1 n2))."""
    ang = (sign * 2.0 * np.pi / (n1 * n2)) * np.outer(np.arange(n1), np.arange(n2))
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _cmatmul(ar, ai, br, bi, precision):
    """(ar + i ai) @ (br + i bi) -> (re, im) with 3 real matmuls (Karatsuba)."""
    dot = partial(jnp.matmul, precision=precision)
    k1 = dot(ar, br + bi)
    k2 = dot(ai + ar, bi)
    k3 = dot(ai - ar, br)
    # re = ar@br - ai@bi = k1 - k2;  im = ar@bi + ai@br = k1 + k3
    return k1 - k2, k1 + k3


def cfft_last(re, im, sign: int, precision=lax.Precision.HIGHEST):
    """Complex DFT along the last axis of (re, im) real arrays.

    re, im: (..., N).  Returns (re, im) transformed, unnormalized.
    """
    n = re.shape[-1]
    dtype = re.dtype
    n1, n2 = _factor(n)
    if n1 == 1 or n <= DENSE_MAX:
        # prime or moderate size: one dense DFT matmul (x @ W^T, W[k,j])
        wr, wi = (jnp.asarray(m) for m in _dft_mats(n, sign, dtype))
        return _cmatmul(re, im, wr, wi, precision)

    # four-step: x[n1*N2 + n2] viewed as A[n1][n2]
    shape = re.shape[:-1]
    ar = re.reshape(*shape, n1, n2)
    ai = im.reshape(*shape, n1, n2)

    # step 1: DFT over n1 (columns): C[k1][n2] = sum_n1 W_N1^{n1 k1} A[n1][n2]
    w1r, w1i = (jnp.asarray(m) for m in _dft_mats(n1, sign, dtype))
    # contract A's n1 axis with the DFT matrix: (k1, n1) @ (..., n1, n2)
    cr, ci = _cmatmul(
        w1r, w1i, ar, ai, precision
    )  # matmul broadcasting: (n1,n1) @ (...,n1,n2) -> (...,n1->k1, n2)

    # step 2: twiddle T[k1][n2]
    tr, ti = (jnp.asarray(m) for m in _twiddle(n1, n2, sign, dtype))
    dr = cr * tr - ci * ti
    di = cr * ti + ci * tr

    # step 3: DFT over n2 (rows): E[k1][k2] = sum_n2 D[k1][n2] W_N2^{n2 k2}
    w2r, w2i = (jnp.asarray(m) for m in _dft_mats(n2, sign, dtype))
    er, ei = _cmatmul(dr, di, w2r, w2i, precision)

    # output order: X[k1 + N1*k2] => [k2][k1] row-major
    er = jnp.swapaxes(er, -1, -2).reshape(*shape, n)
    ei = jnp.swapaxes(ei, -1, -2).reshape(*shape, n)
    return er, ei


def cfft_axis(re, im, axis: int, sign: int, precision=lax.Precision.HIGHEST):
    """Complex DFT along ``axis`` (moveaxis wrapper over cfft_last)."""
    re = jnp.moveaxis(re, axis, -1)
    im = jnp.moveaxis(im, axis, -1)
    re, im = cfft_last(re, im, sign, precision)
    return jnp.moveaxis(re, -1, axis), jnp.moveaxis(im, -1, axis)


def cfft3(pair, sign: int, axes=(-3, -2, -1), precision=lax.Precision.HIGHEST):
    """3-D complex DFT of a stacked pair: pair shape (2, ..., Y, Z, X)."""
    re, im = pair[0], pair[1]
    for ax in axes:
        re, im = cfft_axis(re, im, ax, sign, precision)
    return jnp.stack([re, im])


def ifft3_pair(pair, axes=(-3, -2, -1), precision=lax.Precision.HIGHEST):
    """Unnormalized inverse (FFTW +1) -- the reference convention."""
    return cfft3(pair, +1, axes, precision)


def fft3_pair(pair, axes=(-3, -2, -1), precision=lax.Precision.HIGHEST):
    """Forward (FFTW -1), unnormalized."""
    return cfft3(pair, -1, axes, precision)
