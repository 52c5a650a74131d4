"""PLT eigenmode computation: dynamical matrix of the gravitating lattice.

Generates the eigenmode tables consumed by the PLT correction (the
reference ships a precomputed ``eigmodes128`` blob; this module computes
such tables from first principles so any resolution can be produced).

Physics (Marcos et al. 2006; Garrison et al. 2016): particles on a simple
cubic lattice (spacing 1, unit mass, uniform neutralizing background)
perturbed by a plane wave ``u(R) = eps exp(ik.R)`` feel a linearized force
``F = D(k) eps`` with the dynamical matrix

    D_ab(k) = G sum_{R != 0} t_ab(R) (exp(ik.R) - 1),
    t_ab(R) = -d_a d_b (1/R)  (the tidal tensor of a unit point mass)

The conditionally-convergent sum is evaluated with an Ewald split
``1/r = erfc(ar)/r + erf(ar)/r``:

    D(k)/G = sum_{0<|R|<=rc} s(R) (exp(ik.R) - 1)                (real space)
           + sum_K  g(k+K)  -  sum_{K != 0} g(K)                 (reciprocal)

    s_ab(R) = -d_a d_b erfc(aR)/R
    g_ab(q) = 4 pi (q_a q_b / q^2) exp(-q^2 / 4 a^2)

with the divergent K=0 term of the second reciprocal sum dropped -- that is
exactly the uniform-background subtraction.  Eigenvalues are normalized by
``4 pi G rho_bar`` (rho_bar = 1 per unit cell) so the continuum longitudinal
limit is eps = 1; the Kohn sum rule ``tr eps(k) = 1`` holds for every k != 0
and is used as a numerical self-check.

For each k the table stores the growing mode: the eigenvector most aligned
with k_hat (sign-fixed so e.k_hat >= 0, keeping trilinear interpolation
between neighbors consistent) and its eigenvalue.  Table layout matches the
reference loader (ops/plt.py): [ix, iy, iz in 0..N/2] with x/y indices in
FFT wrap order and the +kz half-space.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erfc


def _real_space_tensor(alpha: float, rcut: float):
    """Lattice vectors R (0 < |R| <= rcut) and s_ab(R), the erfc-damped
    tidal tensor: s_ab = -d_a d_b [erfc(a r)/r].

    d_a d_b f(r) = (f''/r^2 - f'/r^3) r_a r_b + (f'/r) delta_ab  for radial f.
    With f = erfc(ar)/r:
        f'  = -erfc(ar)/r^2 - (2a/sqrt(pi)) exp(-a^2 r^2)/r
        f'' = 2 erfc(ar)/r^3 + (2a/sqrt(pi)) exp(-a^2 r^2) (2/r^2 + 2 a^2)
    """
    n = int(np.floor(rcut))
    g = np.arange(-n, n + 1)
    R = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    r2 = (R**2).sum(1)
    keep = (r2 > 0) & (r2 <= rcut**2)
    R = R[keep].astype(np.float64)
    r = np.sqrt(r2[keep].astype(np.float64))

    pref = 2 * alpha / np.sqrt(np.pi) * np.exp(-(alpha**2) * r * r)
    f1 = -erfc(alpha * r) / r**2 - pref / r
    f2 = 2 * erfc(alpha * r) / r**3 + pref * (2 / r**2 + 2 * alpha**2)

    rr = R[:, :, None] * R[:, None, :] / (r**2)[:, None, None]
    eye = np.eye(3)[None]
    # s_ab = -[ (f2 - f1/r) rhat_a rhat_b + (f1/r) delta_ab ]
    s = -((f2 - f1 / r)[:, None, None] * rr + (f1 / r)[:, None, None] * eye)
    return R, s


def _recip_space_tensor(alpha: float, mcut: int):
    """Reciprocal vectors K = 2 pi m (|m| <= mcut) and the Gaussian factor."""
    g = np.arange(-mcut, mcut + 1)
    M = np.stack(np.meshgrid(g, g, g, indexing="ij"), axis=-1).reshape(-1, 3)
    K = 2 * np.pi * M.astype(np.float64)
    return K


def _g_tensor(q):
    """g_ab(q) = 4 pi q_a q_b / q^2 * exp(-q^2/(4 alpha^2)) -- the Gaussian
    factor is applied by the caller (needs alpha)."""
    q2 = (q**2).sum(-1)
    q2s = np.where(q2 == 0, 1.0, q2)
    return q[..., :, None] * q[..., None, :] / q2s[..., None, None]


def dynamical_matrix(kvecs: np.ndarray, alpha: float = 2.0, rcut: float = 3.6,
                     mcut: int = 4) -> np.ndarray:
    """eps(k) = D(k) / (4 pi G rho_bar) for an array of k vectors (.., 3).

    k in lattice units (first Brillouin zone is [-pi, pi]^3, but any k is
    valid -- D is periodic in the reciprocal lattice).
    Returns (..., 3, 3) symmetric real matrices.
    """
    kvecs = np.asarray(kvecs, dtype=np.float64)
    flat = kvecs.reshape(-1, 3)
    nk = flat.shape[0]
    out = np.zeros((nk, 3, 3))

    R, s = _real_space_tensor(alpha, rcut)
    K = _recip_space_tensor(alpha, mcut)

    # static reciprocal background sum: sum_{K != 0} g(K)
    Knz = K[(K**2).sum(1) > 0]
    gK = _g_tensor(Knz) * np.exp(
        -(Knz**2).sum(1) / (4 * alpha**2)
    )[:, None, None]
    bg = 4 * np.pi * gK.sum(0)

    chunk = max(1, 2**22 // max(len(R), len(K)))
    for i in range(0, nk, chunk):
        k = flat[i : i + chunk]  # (c, 3)
        # real-space: sum s(R) (cos(k.R) - 1)   (sin part cancels by R->-R)
        phase = np.cos(k @ R.T) - 1.0  # (c, nR)
        real = np.einsum("cr,rab->cab", phase, s)
        # reciprocal: sum_K g(k+K)
        q = k[:, None, :] + K[None, :, :]  # (c, nK, 3)
        q2 = (q**2).sum(-1)
        damp = 4 * np.pi * np.exp(-q2 / (4 * alpha**2))
        q2s = np.where(q2 == 0, 1.0, q2)
        recip = np.einsum(
            "cka,ckb,ck->cab", q, q, damp / q2s
        )
        out[i : i + chunk] = real + recip - bg
    return (out / (4 * np.pi)).reshape(*kvecs.shape[:-1], 3, 3)


def growing_mode(eps: np.ndarray, khat: np.ndarray):
    """Pick the growing mode: eigenvector most aligned with k_hat.

    Returns (evec (...,3) sign-fixed so evec . k_hat >= 0, eval (...,)).
    """
    w, v = np.linalg.eigh(eps)  # v[..., :, j] is the j-th eigenvector
    align = np.abs(np.einsum("...ij,...i->...j", v, khat))
    j = np.argmax(align, axis=-1)
    idx = np.indices(j.shape)
    evec = v[(*idx, slice(None), j)]
    eval_ = w[(*idx, j)]
    sign = np.sign(np.einsum("...i,...i->...", evec, khat))
    sign = np.where(sign == 0, 1.0, sign)
    return evec * sign[..., None], eval_


def generate_eigmodes_table(N: int, alpha: float = 2.0, rcut: float = 3.6,
                            mcut: int = 4, verbose: bool = False) -> np.ndarray:
    """Full eigenmode table (N, N, N/2+1, 4) in the reference layout.

    Index (ix, iy, iz): kx = wrap(ix), ky = wrap(iy), kz = iz, in units of
    the grid fundamental 2 pi / N, with wrap(i) = i - N for i > N/2 and
    index N/2 meaning -N/2 (numpy fft convention -- immaterial for D since
    D(-k) = D(k)).
    """
    half = N // 2
    ix = np.arange(N)
    wrap = np.where(ix > half, ix - N, ix)
    wrap = np.where(ix == half, -half, wrap)
    table = np.empty((N, N, half + 1, 4))
    for a, kxi in enumerate(wrap):
        KY, KZ = np.meshgrid(wrap, np.arange(half + 1), indexing="ij")
        KX = np.full_like(KY, kxi)
        k = 2 * np.pi / N * np.stack([KX, KY, KZ], axis=-1).astype(np.float64)
        eps = dynamical_matrix(k, alpha=alpha, rcut=rcut, mcut=mcut)
        kmag = np.linalg.norm(k, axis=-1)
        khat = k / np.where(kmag == 0, 1.0, kmag)[..., None]
        evec, eval_ = growing_mode(eps, khat)
        table[a, :, :, :3] = evec
        table[a, :, :, 3] = eval_
        if verbose and a % 8 == 0:
            print(f"  plane {a}/{N}", flush=True)
    # k = 0: undefined; generation zeroes this mode and the lookup returns
    # norm 0, so store a benign unit entry
    table[0, 0, 0] = [0.0, 0.0, 1.0, 1.0]
    return table
